"""Shared pipeline machinery: module bundle, text encoding, VAE decode.

The pipelines are thin hosts around fully-jitted device programs: one jit for
(text encode + pose encode + full DDIM scan + VAE decode). No per-step Python,
no per-frame decode loops (contrast pipeline_animation_epi.py:366-379,606-662).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cvd_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from cvd_tpu.models.pose_encoder import CameraPoseEncoder
from cvd_tpu.models.unet import UNet3DConditionModel, UNetConfig
from cvd_tpu.models.vae import AutoencoderKL, VAEConfig
from cvd_tpu.schedulers import DDIMScheduler

VAE_SCALE = 0.18215


@dataclasses.dataclass
class PipelineModules:
    """Model defs + param trees for one assembled pipeline."""

    unet: UNet3DConditionModel
    vae: AutoencoderKL
    clip: CLIPTextEncoder
    pose_encoder: CameraPoseEncoder
    scheduler: DDIMScheduler
    unet_params: Dict
    vae_params: Dict
    clip_params: Dict
    pose_encoder_params: Dict
    # optional SparseCtrl residual producer: (SparseControlNetModel, params),
    # set by cli/build.py --controlnet_ckpt; consumed via the UNet's
    # down/mid additional_residual inputs
    controlnet: Optional[tuple] = None

    def params_bundle(self) -> Dict:
        """All param trees as ONE pytree — passed into jitted programs as an
        argument so weights are device buffers, never compile-time constants."""
        return {
            "unet": self.unet_params,
            "vae": self.vae_params,
            "clip": self.clip_params,
            "pose": self.pose_encoder_params,
        }

    def cast_params(self, dtype=jnp.bfloat16) -> "PipelineModules":
        """Cast float weights in place to ``dtype`` (inference only).

        Halves the resident bundle (7.9 GiB f32 -> 4.0 GiB bf16 at full
        size) and the per-step weight HBM traffic. Norm scales/biases are
        still accumulated in f32 inside the kernels, matching the
        reference's fp16-weight GPU deployment (inference_epi.py:160
        ``unet.to(device).to(dtype=torch.float16)``). Keep f32 for
        training and parity evaluation."""

        # One jitted donated program per tree: a per-leaf .astype would
        # dispatch hundreds of ops over the remote-TPU tunnel (~50s extra
        # init); donation frees each f32 buffer as its bf16 copy lands.
        @partial(jax.jit, donate_argnums=0)
        def cast(tree):
            return jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        self.unet_params = cast(self.unet_params)
        self.vae_params = cast(self.vae_params)
        self.clip_params = cast(self.clip_params)
        self.pose_encoder_params = cast(self.pose_encoder_params)
        return self

    @classmethod
    def create(
        cls,
        unet_config: Optional[UNetConfig] = None,
        vae_config: Optional[VAEConfig] = None,
        clip_config: Optional[CLIPTextConfig] = None,
        pose_encoder_kwargs: Optional[dict] = None,
        scheduler: Optional[DDIMScheduler] = None,
        rng: Optional[jax.Array] = None,
        latent_size: int = 32,
        video_length: int = 16,
        fast_init: bool = False,
    ) -> "PipelineModules":
        """Random-init bundle (weights loaded separately via cvd_tpu.io).

        fast_init=True skips the full flax init entirely: parameter SHAPES
        come from jax.eval_shape (no compile, no device op) and values are
        fan-in-scaled uniforms. On an accelerator backend they are generated
        ON DEVICE by one jitted RNG program (persistently cached) — zero
        host->device transfer, which matters over a remote-TPU tunnel where
        shipping the ~8 GB f32 bundle costs ~300 s at ~25 MB/s. On CPU (the
        test mesh) values are host-generated instead: a ~1400-leaf threefry
        program is slower to compile on XLA:CPU than a host memcpy. Override
        with CVD_TPU_FAST_INIT=host|device. For benchmarking and smoke runs
        — per-param init distributions are NOT flax-faithful (timing and
        FLOPs are weight-independent).
        """
        from cvd_tpu.models.epi import EpiConditioning

        if fast_init:
            shapes = abstract_param_shapes(
                unet_config=unet_config, vae_config=vae_config,
                clip_config=clip_config,
                pose_encoder_kwargs=pose_encoder_kwargs,
                latent_size=latent_size, video_length=video_length,
            )
            import os

            import numpy as np

            where = os.environ.get(
                "CVD_TPU_FAST_INIT",
                "host" if jax.default_backend() == "cpu" else "device",
            )
            if where not in ("host", "device"):
                raise ValueError(
                    f"CVD_TPU_FAST_INIT={where!r}: expected 'host' or "
                    "'device' (a typo would silently select the host path)"
                )

            def _fan_scale(s):
                # fan-in-scaled so activations stay O(1) at depth; uniform
                # (distribution is irrelevant for timing/FLOPs), unit var
                fan = s.shape[-2] if len(s.shape) >= 2 else max(s.shape[-1], 1)
                return float(3.0 ** 0.5 / np.sqrt(fan))

            if where == "device":
                module_counter = [0]

                def materialize(tree):
                    leaves, treedef = jax.tree_util.tree_flatten(tree)
                    # distinct stream per module (unet/vae/clip/pose) — the
                    # host path advances one RNG across modules; a fixed
                    # key(0) here would give every module overlapping values
                    module_index = module_counter[0]
                    module_counter[0] += 1

                    # ONE threefry draw for the whole bundle, then static
                    # slice+scale+reshape per leaf: a per-leaf jax.random
                    # call would put ~1400 threefry expansions in the HLO
                    # and take minutes to compile; this compiles in seconds.
                    # NOTE: the flat buffer `u` stays live while the slices
                    # are produced, so peak init memory is ~2x the module's
                    # floating-param bytes (transient; fine on 16 GB chips
                    # at SD1.5 scale — chunk the draw if that ever changes)
                    def gen():
                        total = sum(
                            int(np.prod(s.shape))
                            for s in leaves
                            if jnp.issubdtype(s.dtype, jnp.floating)
                        )
                        u = jax.random.uniform(
                            jax.random.fold_in(jax.random.key(0), module_index),
                            (max(total, 1),),
                            jnp.float32, -1.0, 1.0,
                        )
                        out, off = [], 0
                        for s in leaves:
                            if jnp.issubdtype(s.dtype, jnp.floating):
                                n = int(np.prod(s.shape))
                                chunk = jax.lax.slice(u, (off,), (off + n,))
                                out.append(
                                    (chunk.reshape(s.shape) * _fan_scale(s))
                                    .astype(s.dtype)
                                )
                                off += n
                            else:
                                out.append(jnp.zeros(s.shape, s.dtype))
                        return out

                    return jax.tree_util.tree_unflatten(
                        treedef, jax.jit(gen)()
                    )
            else:
                host_rng = np.random.default_rng(0)

                def materialize(tree):
                    leaves, treedef = jax.tree_util.tree_flatten(tree)
                    out = []
                    for s in leaves:
                        if jnp.issubdtype(s.dtype, jnp.floating):
                            scale = _fan_scale(s)
                            arr = (host_rng.random(s.shape, dtype=np.float32)
                                   * (2 * scale) - scale).astype(s.dtype)
                        else:
                            arr = np.zeros(s.shape, s.dtype)
                        out.append(jnp.asarray(arr))
                    return jax.tree_util.tree_unflatten(treedef, out)

            unet_config = unet_config or UNetConfig()
            vae_config = vae_config or VAEConfig()
            clip_config = clip_config or CLIPTextConfig()
            pe_kwargs = dict(pose_encoder_kwargs or {})
            pe_kwargs.setdefault("dtype", unet_config.dtype)
            return cls(
                UNet3DConditionModel(unet_config), AutoencoderKL(vae_config),
                CLIPTextEncoder(clip_config),
                CameraPoseEncoder(channels=unet_config.block_out_channels,
                                  **pe_kwargs),
                scheduler or DDIMScheduler(),
                materialize(shapes["unet"]), materialize(shapes["vae"]),
                materialize(shapes["clip"]), materialize(shapes["pose"]),
            )

        unet_config = unet_config or UNetConfig()
        vae_config = vae_config or VAEConfig()
        clip_config = clip_config or CLIPTextConfig()
        pose_encoder_kwargs = pose_encoder_kwargs or {}
        rng = rng if rng is not None else jax.random.key(0)
        k1, k2, k3, k4 = jax.random.split(rng, 4)

        unet = UNet3DConditionModel(unet_config)
        vae = AutoencoderKL(vae_config)
        clip = CLIPTextEncoder(clip_config)
        # pose encoder computes in the UNet dtype: at 6 views x 16 frames its
        # f32 stage-0 activations alone are ~0.5 GB (params stay f32;
        # flax casts per-op)
        pose_encoder_kwargs.setdefault("dtype", unet_config.dtype)
        pose_encoder = CameraPoseEncoder(
            channels=unet_config.block_out_channels, **pose_encoder_kwargs
        )

        B, F, s = 2, video_length, latent_size
        ch = unet_config.block_out_channels
        # init on the default backend: XLA-CPU compilation of the full-size
        # UNet takes tens of minutes, the TPU compiles it in seconds
        init_unet = jax.jit(
            partial(
                unet.init,
                sample=jnp.zeros((B, F, s, s, 4)),
                timesteps=jnp.zeros((B,), jnp.int32),
                encoder_hidden_states=jnp.zeros(
                    (B, 77, unet_config.cross_attention_dim)
                ),
                pose_features=[
                    jnp.zeros((B, F, s // (2**i), s // (2**i), ch[i]))
                    for i in range(4)
                ],
                epi_cond=EpiConditioning(
                    F_mats=jnp.zeros((B * F, 3, 3)),
                    video_length=F,
                    rand_slope_ff=False,
                ),
            )
        )
        unet_params = init_unet({"params": k1})
        vae_params = jax.jit(vae.init)(
            k2, jnp.zeros((1, 8 * s, 8 * s, 3)), jax.random.key(0)
        )
        clip_params = jax.jit(clip.init)(k3, jnp.zeros((1, 77), jnp.int32))
        pose_encoder_params = jax.jit(pose_encoder.init)(
            k4, jnp.zeros((1, F, 8 * s, 8 * s, 6))
        )
        return cls(
            unet, vae, clip, pose_encoder, scheduler or DDIMScheduler(),
            unet_params, vae_params, clip_params, pose_encoder_params,
        )


def abstract_param_shapes(
    unet_config: Optional[UNetConfig] = None,
    vae_config: Optional[VAEConfig] = None,
    clip_config: Optional[CLIPTextConfig] = None,
    pose_encoder_kwargs: Optional[dict] = None,
    latent_size: int = 32,
    video_length: int = 16,
):
    """Full-size parameter SHAPE trees via jax.eval_shape — no allocation,
    no compile. Drives checkpoint-manifest validation (io.manifests)."""
    from cvd_tpu.models.epi import EpiConditioning

    unet_config = unet_config or UNetConfig()
    vae_config = vae_config or VAEConfig()
    clip_config = clip_config or CLIPTextConfig()
    pose_encoder_kwargs = dict(pose_encoder_kwargs or {})
    pose_encoder_kwargs.setdefault("dtype", unet_config.dtype)

    unet = UNet3DConditionModel(unet_config)
    vae = AutoencoderKL(vae_config)
    clip = CLIPTextEncoder(clip_config)
    pose_encoder = CameraPoseEncoder(
        channels=unet_config.block_out_channels, **pose_encoder_kwargs
    )
    B, F, s = 2, video_length, latent_size
    ch = unet_config.block_out_channels
    f32 = jnp.float32
    S = jax.ShapeDtypeStruct
    key = jax.random.key(0)

    unet_shapes = jax.eval_shape(
        lambda k, sample, t, text, pose, cond: unet.init(k, sample, t, text,
                                                         pose, cond),
        key,
        S((B, F, s, s, 4), f32),
        S((B,), jnp.int32),
        S((B, 77, unet_config.cross_attention_dim), f32),
        [S((B, F, s // 2**i, s // 2**i, ch[i]), f32) for i in range(4)],
        EpiConditioning(F_mats=S((B * F, 3, 3), f32), video_length=F,
                        rand_slope_ff=False),
    )
    vae_shapes = jax.eval_shape(
        lambda k, x, n: vae.init(k, x, n),
        key, S((1, 8 * s, 8 * s, 3), f32), key,
    )
    clip_shapes = jax.eval_shape(
        lambda k, ids: clip.init(k, ids), key, S((1, 77), jnp.int32)
    )
    pose_shapes = jax.eval_shape(
        lambda k, p: pose_encoder.init(k, p),
        key, S((1, F, 8 * s, 8 * s, 6), f32),
    )
    return {
        "unet": unet_shapes, "vae": vae_shapes, "clip": clip_shapes,
        "pose": pose_shapes,
    }


def encode_prompt(
    modules: PipelineModules,
    clip_params: Dict,
    prompt_ids: jnp.ndarray,
    negative_ids: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (uncond, cond) embeddings, each [B, 77, 768]."""
    cond = modules.clip.apply(clip_params, prompt_ids)
    uncond = modules.clip.apply(clip_params, negative_ids)
    return uncond, cond


def decode_latents(
    modules: PipelineModules, vae_params: Dict, latents: jnp.ndarray,
    frame_chunk: int = 8,
) -> jnp.ndarray:
    """[B, F, h, w, 4] latents -> [B, F, H, W, 3] images in [0, 1].

    Frames decode in chunks through lax.map to bound VAE activation memory
    (replaces the reference's per-frame Python loop with a compiled loop).
    """
    B, F, h, w, c = latents.shape
    flat = latents.reshape(B * F, h, w, c) / VAE_SCALE
    n = flat.shape[0]
    pad = (-n) % frame_chunk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)])
    chunks = flat.reshape(-1, frame_chunk, h, w, c)
    decode = lambda z: modules.vae.apply(vae_params, z, method=modules.vae.decode)
    imgs = jax.lax.map(decode, chunks)
    imgs = imgs.reshape(-1, *imgs.shape[2:])[:n]
    imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
    return imgs.reshape(B, F, *imgs.shape[1:])


def encode_images(
    modules: PipelineModules, vae_params: Dict, images: jnp.ndarray,
    rng: jax.Array, frame_chunk: int = 8,
) -> jnp.ndarray:
    """[N, H, W, 3] in [-1, 1] -> latents [N, H/8, W/8, 4] (sampled, scaled).

    Frames encode in chunks through lax.map, mirroring decode_latents: an
    unchunked 64-frame 256px encode materializes ~1 GiB conv activations
    per layer inside the train step, which pushed the full-size training
    program past a 16 GB chip's HBM (r04 bench_train OOM).
    """
    n = images.shape[0]
    flat = images
    pad = (-n) % frame_chunk
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)])
    chunks = flat.reshape(-1, frame_chunk, *flat.shape[1:])
    keys = jax.random.split(rng, chunks.shape[0])

    def enc(args):
        x, k = args
        return modules.vae.apply(
            vae_params, x, k, method=modules.vae.sample_posterior)

    z = jax.lax.map(enc, (chunks, keys))
    z = z.reshape(-1, *z.shape[2:])[:n]
    return z * VAE_SCALE
