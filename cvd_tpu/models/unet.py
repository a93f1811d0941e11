"""UNet3DConditionModel — SD1.5 UNet inflated to video, with AnimateDiff
motion modules and CVD epi (cross-video sync) modules.

Re-design of the reference ``animatediff/models/unet.py`` +
``unet_blocks.py``: per UNet layer the op order is

    resnet (per frame) -> spatial transformer (per frame, text cross-attn)
    -> motion module (temporal attn, pose-conditioned) -> epi module
    (cross-video epipolar attn)                      [unet_blocks.py:460-476]

Layout is channels-last video ``[B, F, H, W, C]``; per-frame 2D ops fold
frames into batch. The epi conditioning travels as one
``EpiConditioning`` pytree instead of the reference's
F_mats/H_mats/kv_index side channels threaded through processors.

Block/parameter naming mirrors the reference state-dict structure
(down_blocks_{i}.resnets_{j}...) so checkpoint import is a mechanical rule.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvd_tpu.models.epi import EpiConditioning, EpiTransformer
from cvd_tpu.models.layers import (FusedGroupNorm, Conv2d,
    Downsample2D,
    FusionBlock2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
    sinusoidal_time_embedding,
)
from cvd_tpu.models.motion import TemporalTransformer


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_heads: int = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    # motion modules (configs/inference_config.yaml:8-19)
    use_motion_module: bool = True
    motion_module_resolutions: Tuple[int, ...] = (1, 2, 4, 8)
    motion_module_mid_block: bool = False
    motion_num_transformer_blocks: int = 1
    motion_num_attention_blocks: int = 2
    motion_pe_max_len: int = 32
    motion_zero_initialize: bool = False
    # the reference's motion/epi transformers take their GroupNorm group
    # count from motion_module_kwargs/epi_module_kwargs (default 32,
    # motion_module.py:262, epi_module.py:101), NOT from the UNet's
    # norm_num_groups — so they stay at 32 even when the UNet norm differs
    motion_norm_groups: int = 32
    epi_norm_groups: int = 32
    # pose conditioning (configs/inference_config.yaml:48-56)
    pose_cond_attn_indices: Tuple[int, ...] = (0,)
    pose_scale: float = 1.0
    # epi modules (configs/inference_config.yaml:21-32)
    use_epi_module: bool = True
    epi_module_resolutions: Tuple[int, ...] = (1, 2, 4, 8)
    epi_module_mid_block: bool = False
    epi_num_transformer_blocks: int = 1
    epi_num_attention_blocks: int = 2
    epi_zero_initialize: bool = True
    # spatial attention extras (attention_processor.py:69-83, 113-225)
    spatial_extended_attention: bool = False
    # >0: fixed LoRA rank; <0: per-layer rank = channels // (-value)
    # (reference rank rule, unet.py:1028); 0: no LoRA params
    spatial_lora_rank: int = 0
    # sync-LoRA on the pose-conditioned temporal attention q/k/v/out
    # (attention_processor.py:262-270, 341-344; the CVD training recipe's
    # "sync" trainable group). 0 rank or 0 scale = off (reference gate).
    # Rank >16 is absolute; 1..16 resolves per layer to
    # channels // |spatial_lora_rank or 4| — reproducing the reference's
    # quirk of dividing by the IMAGE-LoRA rank (unet.py:1092 uses
    # `hidden_size // lora_rank`, not the sync rank; 4 = the training
    # script's lora_rank default, train_epi_control.py:110).
    sync_lora_rank: int = 0
    sync_lora_scale: float = 1.0
    # first-frame feature fusion (unet.py:107,141-153; off in released configs)
    fuse_first_frame: bool = False
    # auxiliary q/k output channels for the epipolar training loss
    additional_channel: int = 0
    # compile-time dedup: at APPLY time, consecutive layers whose parameter
    # shapes are identical (down block 0, plain down block 3, and the
    # equal-skip runs of the up blocks) run as ONE lax.scan body over
    # trace-time-stacked params instead of being traced/compiled per layer.
    # The param tree and checkpoint import are UNCHANGED (init stays
    # unrolled); outputs are bit-identical (test_unet_scan_layers_*). Cost:
    # the stacked param copies are extra resident HBM (~the deduped subset
    # again), so keep this off for memory-tight runs (6-view single chip).
    scan_identical_layers: bool = False
    # recompute block activations in the backward pass (jax.checkpoint per
    # UNet block). Full-size training at 16f/256px needs ~19 GB of saved
    # activations without it — over a v5e chip's 16 GB HBM.
    remat: bool = False
    # remat granularity: "block" checkpoints whole UNet blocks; "layer"
    # checkpoints each sublayer (resnet / spatial attn / motion / epi)
    # separately. Measured (AOT memory_analysis, full-size B=4/16f/256px
    # train step, 2026-08-19): block 8.03 GiB HLO temps vs layer 8.32 GiB
    # — XLA's scheduler already interleaves the block recompute with its
    # backward, and per-sublayer units just save more residuals, so
    # "block" is the default and "layer" stays as a measured alternative.
    # Same recompute FLOPs either way (each op replayed once).
    remat_unit: str = "block"
    # what the checkpoint units SAVE: "" recomputes everything in the
    # backward (minimum memory, +1 forward of recompute FLOPs); "dots"
    # saves every matmul output (jax.checkpoint_policies.dots_saveable) so
    # the backward replays only convs/norms/elementwise — trades the HBM
    # freed by the pre-encoded-latents training path for fewer recomputed
    # MXU FLOPs. Validated to fit + measured in bench.py --train
    # --remat-policy dots.
    remat_policy: str = ""
    dtype: Any = jnp.float32

    def scaled(self, width_factor: float) -> "UNetConfig":
        """A thinner model for smoke tests: channels scaled, same topology."""
        ch = tuple(max(32, int(c * width_factor) // 32 * 32) for c in self.block_out_channels)
        return dataclasses.replace(self, block_out_channels=ch)


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    B, F = x.shape[:2]
    return x.reshape((B * F,) + x.shape[2:])


def _unfold(x: jnp.ndarray, B: int) -> jnp.ndarray:
    return x.reshape((B, -1) + x.shape[1:])


def _dots_saveable_under(max_bytes: int):
    """dots_saveable (matmul + conv outputs), except results larger than
    ``max_bytes``. Measured on the full-size 16f/256px train step
    (v5e 16 GB, 2026-08-21): 'dots' needs 16.37 G (OOM by 0.6 G) and
    'dots_small' @96 MiB needs 18.21 G — excluding a mid-chain tensor
    makes the backward replay the whole chain up to it while every other
    saved residual stays resident, so the transient recompute peak
    exceeds the bytes saved. Neither fits a v5e at this config (BASELINE
    .md); both remain available for larger-HBM parts (v6e 32 G, v5p
    95 G) where saving matmul outputs is the standard recompute cut."""
    dots = jax.checkpoint_policies.dots_saveable

    def policy(prim, *avals, **params):
        if not dots(prim, *avals, **params):
            return False
        try:
            out, _ = prim.abstract_eval(*avals, **params)
            size = out.size * out.dtype.itemsize
        except Exception:
            return True  # unsizeable: keep dots_saveable's verdict
        return size <= max_bytes

    return policy


def _checkpoint_policy(cfg: UNetConfig):
    """Resolve ``cfg.remat_policy`` to a jax.checkpoint policy (None =
    save nothing, i.e. classic full rematerialization)."""
    if not cfg.remat_policy:
        return None
    import os as _os

    policies = {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_small": _dots_saveable_under(
            int(_os.environ.get("CVD_TPU_REMAT_SAVE_MAX_BYTES",
                                96 * 1024 * 1024))),
    }
    if cfg.remat_policy not in policies:
        # a typo would silently change the memory/recompute trade-off
        raise ValueError(
            f"remat_policy={cfg.remat_policy!r}: expected one of "
            f"{('',) + tuple(policies)}"
        )
    return policies[cfg.remat_policy]


def _lora_rank(cfg: UNetConfig, channels: int) -> int:
    if cfg.spatial_lora_rank > 0:
        return cfg.spatial_lora_rank
    if cfg.spatial_lora_rank < 0:
        return channels // (-cfg.spatial_lora_rank)
    return 0


def _sync_lora_rank(cfg: UNetConfig, channels: int) -> int:
    """Effective per-layer sync-LoRA rank (reference unet.py:1092):
    absolute when >16, else channels // image_lora_rank — the reference
    divides by the image-LoRA rank argument, not the sync rank (quirk kept
    for checkpoint-shape parity; 4 = train_epi_control.py:110 default)."""
    if cfg.sync_lora_rank == 0 or cfg.sync_lora_scale == 0.0:
        return 0
    if cfg.sync_lora_rank > 16:
        return cfg.sync_lora_rank
    return channels // (abs(cfg.spatial_lora_rank) or 4)


def _stack_layer_params(params, roles, js):
    """[{role: params[f'{prefix}_{j}'] for j in js}] stacked leaf-wise.

    The stack is loop-invariant w.r.t. the sampling scan, so XLA hoists it
    out (a one-time copy); gradients flow back through stack->slice."""
    per = [
        {role: params[f"{prefix}_{j}"] for role, prefix in roles.items()}
        for j in js
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)


def _unstack_aux(aux_stacked, n) -> List[dict]:
    """scan-stacked aux pytrees -> flat per-layer list (layer-major, same
    order the unrolled loop's ``aux += a`` produces)."""
    out: List[dict] = []
    for j in range(n):
        for d in aux_stacked:
            out.append(jax.tree_util.tree_map(lambda v: v[j], d))
    return out


def _scan_keys(module, n):
    """Per-layer 'epi_slope' keys for a detached scan body; a dummy key
    array when the caller provided no rng (the epi module only draws when
    rand_slope_ff needs it, so an unused rng is harmless)."""
    if module.has_rng("epi_slope"):
        return jax.random.split(module.make_rng("epi_slope"), n)
    return jax.random.split(jax.random.key(0), n)


def _layer_modules(cfg: UNetConfig, channels: int, temb_dim: int, j=None, *,
                   heads=None, cross_dim=None, with_attn=False,
                   with_motion=False, with_epi=False):
    """The (resnet, attn?, motion?, epi?) submodule defs of one UNet layer.

    With an int ``j``, builds the NAMED instances (``resnets_j``,
    ``attentions_j``, ``motion_modules_j``, ``epi_modules_j``) used by the
    unrolled path and the init/checkpoint layout; with ``j=None``, builds
    detached protos (``parent=None``) for a ``lax.scan`` body over
    trace-time-stacked params. One constructor site for both paths, so the
    scan and unrolled variants cannot diverge in hyperparameters.
    """
    def kw(base):
        return {"parent": None} if j is None else {"name": f"{base}_{j}"}

    # per-sublayer remat: each submodule is its own jax.checkpoint unit, so
    # a training backward recomputes ONE sublayer at a time instead of a
    # whole 9-sublayer block (param names/tree unchanged — nn.remat is a
    # lifted transform). Also applies inside the lax.scan dedup body.
    lift = (functools.partial(nn.remat, policy=_checkpoint_policy(cfg))
            if (cfg.remat and cfg.remat_unit == "layer")
            else (lambda cls: cls))

    resnet = lift(ResnetBlock2D)(channels, temb_dim, cfg.norm_num_groups,
                                 dtype=cfg.dtype, **kw("resnets"))
    attn = lift(Transformer2DModel)(
        channels, heads, channels // heads,
        cross_attention_dim=cross_dim,
        extended_attention=cfg.spatial_extended_attention,
        lora_rank=_lora_rank(cfg, channels),
        groups=cfg.norm_num_groups, dtype=cfg.dtype, **kw("attentions"),
    ) if with_attn else None
    motion = lift(TemporalTransformer)(
        channels, cfg.attention_heads,
        cfg.motion_num_transformer_blocks, cfg.motion_num_attention_blocks,
        cfg.motion_pe_max_len, cfg.pose_cond_attn_indices, cfg.pose_scale,
        cfg.motion_norm_groups, cfg.motion_zero_initialize,
        sync_lora_rank=_sync_lora_rank(cfg, channels),
        sync_lora_scale=cfg.sync_lora_scale,
        dtype=cfg.dtype, **kw("motion_modules"),
    ) if with_motion else None
    epi = lift(EpiTransformer)(
        channels, cfg.attention_heads,
        cfg.epi_num_transformer_blocks, cfg.epi_num_attention_blocks,
        cfg.epi_norm_groups, cfg.epi_zero_initialize,
        dtype=cfg.dtype, **kw("epi_modules"),
    ) if with_epi else None
    return resnet, attn, motion, epi


_SCAN_ROLES = (("resnet", "resnets"), ("attn", "attentions"),
               ("motion", "motion_modules"), ("epi", "epi_modules"))


def _scan_layer_group(block, protos, group, x, *, B, temb_f, context_f=None,
                      pose_feature=None, epi_cond=None, lora_scale=1.0,
                      skips=None, collect_res=False):
    """Run the layers in ``group`` as ONE lax.scan over stacked params.

    The body is the same resnet -> attn -> motion -> epi sequence as the
    unrolled path (tests/test_unet_scan.py pins forward+grad equivalence).
    ``skips`` (up blocks) are concatenated onto the carry before the
    resnet. Returns (x, per-layer res list | None, flat aux list).
    """
    resnet_p, attn_p, motion_p, epi_p = protos
    present = dict(zip(("resnet", "attn", "motion", "epi"), protos))
    roles = {role: prefix for role, prefix in _SCAN_ROLES
             if present[role] is not None}
    stacked = _stack_layer_params(block.variables["params"], roles, group)
    keys = _scan_keys(block, len(group))

    def body(xc, xs):
        if skips is None:
            pj, kj = xs
        else:
            pj, skip, kj = xs
            xc = jnp.concatenate([xc, skip], axis=-1)
        h = resnet_p.apply({"params": pj["resnet"]}, _fold(xc), temb_f)
        if attn_p is not None:
            h = attn_p.apply({"params": pj["attn"]}, h, context_f,
                             lora_scale=lora_scale)
        xc = _unfold(h, B)
        if motion_p is not None:
            xc = motion_p.apply({"params": pj["motion"]}, xc, pose_feature)
        a = ()
        if epi_p is not None:
            xc, a_list = epi_p.apply({"params": pj["epi"]}, xc, epi_cond,
                                     rngs={"epi_slope": kj})
            a = tuple(a_list)
        return xc, ((xc, a) if collect_res else a)

    xs = (stacked, keys) if skips is None else (stacked, skips, keys)
    x, out = jax.lax.scan(body, x, xs)
    if collect_res:
        res_stacked, aux_stacked = out
        res = [res_stacked[i] for i in range(len(group))]
    else:
        res, aux_stacked = None, out
    return x, res, _unstack_aux(aux_stacked, len(group))


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    add_downsample: bool
    use_motion: bool
    use_epi: bool
    cfg: UNetConfig

    def _defs(self, temb_dim, j=None):
        return _layer_modules(self.cfg, self.out_channels, temb_dim, j,
                              heads=self.heads,
                              cross_dim=self.cross_attention_dim,
                              with_attn=True, with_motion=self.use_motion,
                              with_epi=self.use_epi)

    @nn.compact
    def __call__(self, x, temb, context, pose_feature, epi_cond,
                 lora_scale=1.0, pab=None):
        cfg = self.cfg
        B = x.shape[0]
        temb_f = jnp.repeat(temb, x.shape[1], axis=0)
        context_f = jnp.repeat(context, x.shape[1], axis=0)
        res_states: List[jnp.ndarray] = []
        aux: List[dict] = []

        # layer dedup: when every layer has identical param shapes (possible
        # only when the block's input channels already equal out_channels,
        # i.e. down block 0), run the layers as ONE scan body. PAB caches
        # are per-layer state the stacked-param scan body cannot carry, so
        # the dedup path requires pab=None (the pipeline enforces this).
        if (cfg.scan_identical_layers and not self.is_initializing()
                and pab is None and self.num_layers >= 2
                and x.shape[-1] == self.out_channels):
            x, res_states, aux = _scan_layer_group(
                self, self._defs(temb.shape[-1]), range(self.num_layers), x,
                B=B, temb_f=temb_f, context_f=context_f,
                pose_feature=pose_feature, epi_cond=epi_cond,
                lora_scale=lora_scale, collect_res=True,
            )
        else:
            for j in range(self.num_layers):
                resnet, attn, motion, epi = self._defs(temb.shape[-1], j)
                h = resnet(_fold(x), temb_f)
                h = attn(h, context_f, lora_scale=lora_scale, pab=pab)
                x = _unfold(h, B)
                if motion is not None:
                    x = motion(x, pose_feature,
                               pab_reuse=None if pab is None
                               else pab.get("temporal"))
                if epi is not None:
                    x, a = epi(x, epi_cond,
                               pab_reuse=None if pab is None
                               else pab.get("epi"))
                    aux += a
                res_states.append(x)
        if self.add_downsample:
            x = _unfold(Downsample2D(self.out_channels, dtype=cfg.dtype, name="downsamplers_0")(_fold(x)), B)
            res_states.append(x)
        return x, res_states, aux


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    use_motion: bool
    use_epi: bool
    cfg: UNetConfig

    def _defs(self, temb_dim, j=None):
        return _layer_modules(self.cfg, self.out_channels, temb_dim, j,
                              with_motion=self.use_motion,
                              with_epi=self.use_epi)

    @nn.compact
    def __call__(self, x, temb, pose_feature, epi_cond, pab=None):
        cfg = self.cfg
        B = x.shape[0]
        temb_f = jnp.repeat(temb, x.shape[1], axis=0)
        res_states: List[jnp.ndarray] = []
        aux: List[dict] = []
        if (cfg.scan_identical_layers and not self.is_initializing()
                and pab is None and self.num_layers >= 2
                and x.shape[-1] == self.out_channels):
            x, res_states, aux = _scan_layer_group(
                self, self._defs(temb.shape[-1]), range(self.num_layers), x,
                B=B, temb_f=temb_f, pose_feature=pose_feature,
                epi_cond=epi_cond, collect_res=True,
            )
        else:
            for j in range(self.num_layers):
                resnet, _, motion, epi = self._defs(temb.shape[-1], j)
                x = _unfold(resnet(_fold(x), temb_f), B)
                if motion is not None:
                    x = motion(x, pose_feature,
                               pab_reuse=None if pab is None
                               else pab.get("temporal"))
                if epi is not None:
                    x, a = epi(x, epi_cond,
                               pab_reuse=None if pab is None
                               else pab.get("epi"))
                    aux += a
                res_states.append(x)
        if self.add_downsample:
            x = _unfold(Downsample2D(self.out_channels, dtype=cfg.dtype, name="downsamplers_0")(_fold(x)), B)
            res_states.append(x)
        return x, res_states, aux


class MidBlock(nn.Module):
    channels: int
    heads: int
    cross_attention_dim: int
    use_motion: bool
    use_epi: bool
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb, context, pose_feature, epi_cond,
                 lora_scale=1.0, pab=None):
        cfg = self.cfg
        B = x.shape[0]
        temb_f = jnp.repeat(temb, x.shape[1], axis=0)
        context_f = jnp.repeat(context, x.shape[1], axis=0)
        aux: List[dict] = []
        resnet0, attn, motion, epi = _layer_modules(
            cfg, self.channels, temb.shape[-1], 0, heads=self.heads,
            cross_dim=self.cross_attention_dim, with_attn=True,
            with_motion=self.use_motion, with_epi=self.use_epi,
        )
        h = resnet0(_fold(x), temb_f)
        h = attn(h, context_f, lora_scale=lora_scale, pab=pab)
        x = _unfold(h, B)
        if motion is not None:
            x = motion(x, pose_feature,
                       pab_reuse=None if pab is None else pab.get("temporal"))
        if epi is not None:
            x, a = epi(x, epi_cond,
                       pab_reuse=None if pab is None else pab.get("epi"))
            aux += a
        Res1 = (nn.remat(ResnetBlock2D)
                if (cfg.remat and cfg.remat_unit == "layer")
                else ResnetBlock2D)
        h = Res1(
            self.channels, temb.shape[-1], cfg.norm_num_groups,
            dtype=cfg.dtype, name="resnets_1",
        )(_fold(x), temb_f)
        return _unfold(h, B), aux


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    prev_output_channel: int
    input_channel: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    add_upsample: bool
    use_motion: bool
    use_epi: bool
    has_attention: bool
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, res_states, temb, context, pose_feature, epi_cond,
                 lora_scale=1.0, pab=None):
        cfg = self.cfg
        B = x.shape[0]
        temb_f = jnp.repeat(temb, x.shape[1], axis=0)
        context_f = jnp.repeat(context, x.shape[1], axis=0) if context is not None else None
        aux: List[dict] = []

        def _defs(j=None):
            return _layer_modules(cfg, self.out_channels, temb.shape[-1], j,
                                  heads=self.heads,
                                  cross_dim=self.cross_attention_dim,
                                  with_attn=self.has_attention,
                                  with_motion=self.use_motion,
                                  with_epi=self.use_epi)

        def one_layer(x, j):
            """The original unrolled layer j (named submodules)."""
            res = res_states[-1 - j]
            x = jnp.concatenate([x, res], axis=-1)
            resnet, attn, motion, epi = _defs(j)
            h = resnet(_fold(x), temb_f)
            if attn is not None:
                h = attn(h, context_f, lora_scale=lora_scale, pab=pab)
            x = _unfold(h, B)
            if motion is not None:
                x = motion(x, pose_feature,
                           pab_reuse=None if pab is None
                           else pab.get("temporal"))
            if epi is not None:
                x, a = epi(x, epi_cond,
                           pab_reuse=None if pab is None
                           else pab.get("epi"))
                aux.extend(a)
            return x

        # per-layer resnet input channels: a consecutive run with equal
        # input width (equal skip widths, since every layer outputs
        # out_channels) has identical param shapes and can scan
        in_chs = []
        cur = x.shape[-1]
        for j in range(self.num_layers):
            in_chs.append(cur + res_states[-1 - j].shape[-1])
            cur = self.out_channels

        j = 0
        scan_ok = (cfg.scan_identical_layers and not self.is_initializing()
                   and pab is None)
        while j < self.num_layers:
            k = j
            while (scan_ok and k + 1 < self.num_layers
                   and in_chs[k + 1] == in_chs[j]):
                k += 1
            group = list(range(j, k + 1))
            if not scan_ok or len(group) < 2:
                x = one_layer(x, j)
                j += 1
                continue
            skips = jnp.stack([res_states[-1 - g] for g in group])
            x, _, a = _scan_layer_group(
                self, _defs(), group, x, B=B, temb_f=temb_f,
                context_f=context_f, pose_feature=pose_feature,
                epi_cond=epi_cond, lora_scale=lora_scale, skips=skips,
            )
            aux.extend(a)
            j = k + 1
        if self.add_upsample:
            x = _unfold(Upsample2D(self.out_channels, dtype=cfg.dtype, name="upsamplers_0")(_fold(x)), B)
        return x, aux


class UNet3DConditionModel(nn.Module):
    """Pose- and epipolar-conditioned video UNet (the reference's
    UNet3DConditionModelPoseCond, unet.py:917-1452)."""

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, H, W, C_in]
        timesteps: jnp.ndarray,  # [] or [B]
        encoder_hidden_states: jnp.ndarray,  # [B, L, cross_dim]
        pose_features: Optional[Sequence[jnp.ndarray]] = None,  # 4x [B,F,h,w,c]
        epi_cond: Optional[EpiConditioning] = None,
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        lora_scale: float = 1.0,
        pab=None,
    ):
        """pab: optional dict of traced bool scalars keyed by attention
        class ("spatial"/"cross"/"temporal"/"epi") — Pyramid Attention
        Broadcast reuse flags for this call (pipelines/pab.py). Requires
        scan_identical_layers=False and mutable=["pab"] on apply()."""
        cfg = self.config
        if pab is not None and cfg.scan_identical_layers:
            raise ValueError(
                "PAB caches are per-layer state the scan-dedup body cannot "
                "carry; build the UNet with scan_identical_layers=False"
            )
        if cfg.remat_unit not in ("layer", "block"):
            # a typo would silently disable remat entirely and OOM training
            raise ValueError(
                f"remat_unit={cfg.remat_unit!r}: expected 'layer' or 'block'"
            )
        B, F = sample.shape[:2]
        ch = cfg.block_out_channels
        heads = cfg.attention_heads

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))
        t_emb = sinusoidal_time_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=cfg.dtype, name="time_embedding")(
            t_emb.astype(cfg.dtype)
        )

        if pose_features is None:
            pose_features = [None] * 4

        # rematerialized block variants for memory-bound training; with
        # remat_unit="layer" the checkpoint units live INSIDE the blocks
        # (_layer_modules), so the block classes stay unwrapped
        pol = _checkpoint_policy(cfg)
        DownCls, PlainDownCls, MidCls, UpCls = (
            (nn.remat(CrossAttnDownBlock, policy=pol),
             nn.remat(DownBlock, policy=pol),
             nn.remat(MidBlock, policy=pol),
             nn.remat(CrossAttnUpBlock, policy=pol))
            if cfg.remat and cfg.remat_unit == "block"
            else (CrossAttnDownBlock, DownBlock, MidBlock, CrossAttnUpBlock)
        )

        x = _unfold(
            Conv2d(ch[0], 3, 1, 1, dtype=cfg.dtype, name="conv_in")(_fold(sample)), B
        )
        if cfg.fuse_first_frame:
            fused = FusionBlock2D(ch[0], dtype=cfg.dtype, name="down_fusers_0")(
                x[:, :1], x[:, 1:], temb
            )
            x = jnp.concatenate([x[:, :1], fused], axis=1)

        res_stack: List[jnp.ndarray] = [x]
        aux_all: List[dict] = []

        # down
        for i in range(len(ch)):
            res = 2**i
            is_final = i == len(ch) - 1
            use_motion = cfg.use_motion_module and res in cfg.motion_module_resolutions
            use_epi = cfg.use_epi_module and res in cfg.epi_module_resolutions
            if not is_final:
                x, res_states, aux = DownCls(
                    ch[i], cfg.layers_per_block, heads, cfg.cross_attention_dim,
                    add_downsample=True, use_motion=use_motion, use_epi=use_epi,
                    cfg=cfg, name=f"down_blocks_{i}",
                )(x, temb, encoder_hidden_states, pose_features[i], epi_cond,
                  lora_scale=lora_scale, pab=pab)
            else:
                x, res_states, aux = PlainDownCls(
                    ch[i], cfg.layers_per_block, add_downsample=False,
                    use_motion=use_motion, use_epi=use_epi,
                    cfg=cfg, name=f"down_blocks_{i}",
                )(x, temb, pose_features[i], epi_cond, pab=pab)
            res_stack += res_states
            aux_all += aux

        if down_block_additional_residuals is not None:
            res_stack = [
                r + extra for r, extra in zip(res_stack, down_block_additional_residuals)
            ]

        # mid
        x, aux = MidCls(
            ch[-1], heads, cfg.cross_attention_dim,
            use_motion=cfg.use_motion_module and cfg.motion_module_mid_block,
            use_epi=cfg.use_epi_module and cfg.epi_module_mid_block,
            cfg=cfg, name="mid_block",
        )(x, temb, encoder_hidden_states, pose_features[-1], epi_cond,
          lora_scale=lora_scale, pab=pab)
        aux_all += aux

        if cfg.fuse_first_frame:
            fused = FusionBlock2D(ch[-1], dtype=cfg.dtype, name="mid_fuser")(
                x[:, :1], x[:, 1:], temb
            )
            x = jnp.concatenate([x[:, :1], fused], axis=1)

        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual

        # up
        rev_ch = list(reversed(ch))
        prev_out = rev_ch[0]
        for i in range(len(ch)):
            res = 2 ** (3 - i)
            is_final = i == len(ch) - 1
            use_motion = cfg.use_motion_module and res in cfg.motion_module_resolutions
            use_epi = cfg.use_epi_module and res in cfg.epi_module_resolutions
            out_ch = rev_ch[i]
            in_ch = rev_ch[min(i + 1, len(ch) - 1)]
            n_layers = cfg.layers_per_block + 1
            res_states = res_stack[-n_layers:]
            res_stack = res_stack[:-n_layers]
            x, aux = UpCls(
                out_ch, prev_out, in_ch, n_layers, heads, cfg.cross_attention_dim,
                add_upsample=not is_final, use_motion=use_motion, use_epi=use_epi,
                has_attention=(i != 0),  # up_block 0 is UpBlock3D (no spatial attn)
                cfg=cfg, name=f"up_blocks_{i}",
            )(x, res_states, temb, encoder_hidden_states,
              pose_features[-(i + 1)], epi_cond, lora_scale=lora_scale,
              pab=pab)
            aux_all += aux
            prev_out = out_ch

        # out: frame-wise GroupNorm (unet.py:1422-1424), silu, conv
        h = FusedGroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=1e-5, dtype=cfg.dtype,
            act="silu", name="conv_norm_out",
        )(_fold(x))
        out = Conv2d(cfg.out_channels, 3, 1, 1, dtype=cfg.dtype, name="conv_out")(h)
        out = _unfold(out, B)

        auxiliary = None
        if cfg.additional_channel > 0 and aux_all:
            # 1x1 convs over the last epi layer's q/k maps (unet.py:1429-1443)
            q, k = aux_all[-1]["query"], aux_all[-1]["key"]
            BF, N, C = q.shape
            s = int(round(N**0.5))
            qm = q.reshape(B, F, s, s, C)
            km = k.reshape(B, F, s, s, C)
            aq = _unfold(Conv2d(cfg.additional_channel, 1, 1, 0, dtype=cfg.dtype,
                                name="conv_auxiliary_query")(_fold(qm)), B)
            ak = _unfold(Conv2d(cfg.additional_channel, 1, 1, 0, dtype=cfg.dtype,
                                name="conv_auxiliary_key")(_fold(km)), B)
            auxiliary = jnp.concatenate([aq, ak], axis=-1)

        return out, {"auxiliary": auxiliary, "epi_qk": aux_all}
