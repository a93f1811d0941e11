"""Sharded wrappers that keep the Pallas kernels on multi-chip meshes.

A ``pallas_call`` traced under GSPMD forces its operands to
gather/replicate, so the mesh pipelines historically fell back to the XLA
attention paths. These wrappers instead drop to ``jax.shard_map`` around
each attention op: every chip runs the SAME fused kernel on its local
shard, and the only cross-chip traffic is the op's minimal collective —

* spatial attention: none (batch rows are independent);
* temporal attention: all-gather of k/v over the ``frames`` axis (classic
  sequence parallelism — queries stay frame-sharded, keys/values are
  gathered so every pixel sees all frames);
* epipolar cross-video attention: all-gather of k/v over the ``rows``
  axis, then the kernel's kv_index routing picks each query row's partner
  video out of the gathered block (reference semantics:
  attention_processor.py:575-583). The routing index may be traced (the
  advanced pipeline's random pairing), which a static ppermute could not
  express.

Token layouts and mesh conventions match cvd_tpu.parallel.inference_mesh:
the UNet batch (views x CFG) rows shard over ``rows``, the frame axis over
``frames``. Flattened ``(b f)`` batch-major token dims shard over
``("rows", "frames")`` jointly, which matches b-major flattening exactly
because both factorizations are row-major.

The wrappers also support the TRAINING mesh — a 1-D ``("data",)`` mesh
where the folded-video batch axis shards on axis 0 and frames stay local
(train/train_step.py). There spatial and temporal attention are fully
local (whole videos per device); only the epipolar cross-video attention
needs a collective (all-gather of k/v over ``data``, since the chunk-swap
partner video lives B/2 rows away — usually on another device). All three
kernels carry custom_vjp rules and the all-gather transposes to
psum_scatter, so the wrappers are differentiable and the mesh train step
keeps the fused kernels instead of falling back to XLA attention.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def flat_batch_axes(mesh: Optional[Mesh]):
    """Mesh axis names a flattened (b f) batch-major token dim shards over,
    or None if this mesh layout is not one the wrappers understand."""
    if mesh is None:
        return None
    names = tuple(mesh.axis_names)
    if names in (("rows", "frames"), ("data",)):
        return names
    return None


def mesh_ok_for_kernels(mesh: Optional[Mesh], B: int, F: int) -> bool:
    """True when the sharded EPI kernel path supports (videos B, frames F)
    on this mesh: the ("rows","frames") inference mesh with evenly
    divisible videos and frames, or the ("data",) training mesh with whole
    videos per device (frames are never sharded there)."""
    names = flat_batch_axes(mesh)
    if names is None:
        return False
    if names == ("data",):
        return B % mesh.shape["data"] == 0
    R = mesh.shape["rows"]
    C = mesh.shape["frames"]
    return B % R == 0 and F % C == 0


def temporal_mesh_ok(mesh: Optional[Mesh], B: int, F: int) -> bool:
    """Divisibility check for the sharded temporal kernel on [B, N, F, C]."""
    names = flat_batch_axes(mesh)
    if names is None:
        return False
    if names == ("data",):
        return B % mesh.shape["data"] == 0
    return B % mesh.shape["rows"] == 0 and F % mesh.shape["frames"] == 0


def sharded_spatial_flash(q, k, v, heads: int, mesh: Mesh):
    """Self-attention on [(b f), N, C] tokens: rows independent, zero
    collectives — shard_map just makes the kernel run on local rows."""
    from cvd_tpu.ops.epi_flash import flash_attention

    spec = P(flat_batch_axes(mesh), None, None)

    def local(ql, kl, vl):
        return flash_attention(ql, kl, vl, heads=heads)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def sharded_temporal_flash(q, k, v, mask, heads: int, mesh: Mesh):
    """Per-pixel temporal attention on [B, N, F, C].

    Inference mesh: q stays frame-sharded, k/v all-gather over 'frames' so
    local frames attend over all frames (classic sequence parallelism).
    Training mesh: frames are local, so the kernel runs shard-local with
    the full mask and zero collectives."""
    from cvd_tpu.ops.temporal_attn import temporal_flash_attention

    if flat_batch_axes(mesh) == ("data",):
        spec = P("data", None, None, None)

        def local_data(ql, kl, vl):
            return temporal_flash_attention(ql, kl, vl, mask, heads=heads)

        return jax.shard_map(
            local_data, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False,
        )(q, k, v)

    spec = P("rows", None, "frames", None)
    F_total = q.shape[2]
    Cf = mesh.shape["frames"]
    F_loc = F_total // Cf

    def local(ql, kl, vl):
        kg = jax.lax.all_gather(kl, "frames", axis=2, tiled=True)
        vg = jax.lax.all_gather(vl, "frames", axis=2, tiled=True)
        mask_l = None
        if mask is not None:
            off = jax.lax.axis_index("frames") * F_loc
            mask_l = jax.lax.dynamic_slice(
                mask, (off, 0), (F_loc, F_total)
            )
        return temporal_flash_attention(ql, kg, vg, mask_l, heads=heads)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def sharded_epi_flash(
    q, k, v, norm_lines, coords, band, alpha, heads: int,
    kv_index, video_length: int, mesh: Mesh,
):
    """Cross-video epipolar attention on [(b f), N, C] tokens.

    kv_index: [B_glob] int32 GLOBAL row routing (query row g reads k/v of
    row kv_index[g]); partners always share the frame index.

    The joint P(("rows","frames")) sharding of the flattened (b f) dim
    assigns device d = r*Cf + c the CONTIGUOUS global rows
    [d*B_loc, (d+1)*B_loc) with B_loc = (Bv/R)*(Fw/Cf) — which factorizes
    as (video-block, frame-block) ONLY when Bv == R. In that case a
    'rows'-only all-gather holds every partner (partners share the frame,
    hence the device's frames coordinate), and the gathered position of
    global row g is (chunk(g)//Cf)*B_loc + g%B_loc with
    chunk(g) = g//B_loc. When Bv > R and Cf > 1 the chunking splits
    VIDEOS across the frames axis, so a same-frame partner can live on a
    device with a different frames coordinate — then we gather k/v over
    BOTH mesh axes (reconstructing the full global rows in order, since
    the tuple-axis gather concatenates rows-major/frames-minor exactly
    like the chunk assignment) and route with the global index directly.
    """
    from cvd_tpu.ops.epi_flash import epi_flash_attention

    if flat_batch_axes(mesh) == ("data",):
        # training mesh: whole videos per device, contiguous global rows.
        # The chunk-swap partner video sits B/2 rows away (another device),
        # so gather k/v over 'data' — full global rows in order — and route
        # with the global index directly. Differentiation scatters dk/dv
        # back through the all-gather's transpose (psum_scatter).
        spec = P("data", None, None)
        vec = P("data")

        def local_data(ql, kl, vl, linesl, bandl, alphal, idxl):
            kg = jax.lax.all_gather(kl, "data", axis=0, tiled=True)
            vg = jax.lax.all_gather(vl, "data", axis=0, tiled=True)
            return epi_flash_attention(
                ql, kg, vg, linesl, coords, bandl, alphal,
                heads=heads, kv_index=idxl.astype(jnp.int32),
            )

        return jax.shard_map(
            local_data, mesh=mesh,
            in_specs=(spec, spec, spec, spec, vec, vec, vec),
            out_specs=spec, check_vma=False,
        )(q, k, v, norm_lines, band, alpha, kv_index.astype(jnp.int32))

    spec = P(("rows", "frames"), None, None)
    vec = P(("rows", "frames"))
    B_glob = q.shape[0]
    R = mesh.shape["rows"]
    Cf = mesh.shape["frames"]
    B_videos = B_glob // video_length          # b dim of the (b f) layout
    Fw = video_length
    F_loc = Fw // Cf
    B_loc = (B_videos // R) * F_loc            # rows per device
    # rows-only gather is sufficient iff chunk(g) % Cf depends only on the
    # frame index — true exactly when Bv/R == 1 (or trivially Cf == 1)
    full_gather = (B_videos // R) > 1 and Cf > 1

    def local(ql, kl, vl, linesl, bandl, alphal, idxl):
        if full_gather:
            kg = jax.lax.all_gather(kl, ("rows", "frames"), axis=0, tiled=True)
            vg = jax.lax.all_gather(vl, ("rows", "frames"), axis=0, tiled=True)
            local_idx = idxl.astype(jnp.int32)  # full global rows present
        else:
            kg = jax.lax.all_gather(kl, "rows", axis=0, tiled=True)
            vg = jax.lax.all_gather(vl, "rows", axis=0, tiled=True)
            # gathered block = [chunk(0*Cf+c), chunk(1*Cf+c), ...]; global
            # row g sits at (chunk(g)//Cf)*B_loc + g%B_loc
            d = idxl // B_loc
            local_idx = ((d // Cf) * B_loc + idxl % B_loc).astype(jnp.int32)
        return epi_flash_attention(
            ql, kg, vg, linesl, coords, bandl, alphal,
            heads=heads, kv_index=local_idx,
        )

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, vec, vec, vec),
        out_specs=spec, check_vma=False,
    )(q, k, v, norm_lines, band, alpha, kv_index.astype(jnp.int32))
