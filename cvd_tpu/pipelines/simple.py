"""Simple 2-view pipeline — reproduces ``pipeline_animation_epi.py``'s
AnimationPipelineEpiControl semantics as ONE jitted device program:

* 4-way chunk-ordered CFG batch [uncond-src, cond-src, uncond-tgt, cond-tgt]
  (reference :565-573, 628-646)
* pose encoder runs once outside the loop (:592-598)
* DDIM loop as lax.scan over 25 timesteps (:606-662)
* whole-video VAE decode (:665)

The reference runs ~25 Python iterations each launching dozens of kernels;
here the entire sampling run is one XLA computation.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cvd_tpu.models.epi import EpiConditioning
from cvd_tpu.pipelines import common
from cvd_tpu.pipelines.common import PipelineModules, decode_latents, encode_prompt


class SimplePipeline:
    """2-view, fixed-pair generation with epipolar sync."""

    def __init__(self, modules: PipelineModules, F_mat_size: int = 256,
                 rand_slope_ff: bool = True, use_flash_kernel: Optional[bool] = None):
        self.m = modules
        self.F_mat_size = F_mat_size
        self.rand_slope_ff = rand_slope_ff
        if use_flash_kernel is None:
            use_flash_kernel = jax.default_backend() == "tpu"
        self.use_flash_kernel = use_flash_kernel
        self._jitted = {}

    def __call__(
        self,
        prompt_ids,  # [1, 77] int32
        negative_ids,  # [1, 77] int32
        plucker,  # [2, F, H, W, 6]
        F_mats,  # [2, F, 3, 3] folded pair mats (video-major)
        num_inference_steps: int = 25,
        guidance_scale: float = 8.5,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        decode: bool = True,
    ):
        """Returns images [2, F, H, W, 3] in [0,1] (or raw latents)."""
        rng = rng if rng is not None else jax.random.key(0)
        key = (num_inference_steps, float(guidance_scale), decode, latents is None)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                partial(
                    self._run,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=float(guidance_scale),
                    decode=decode,
                )
            )
        return self._jitted[key](
            self.m.params_bundle(), prompt_ids, negative_ids, plucker, F_mats,
            rng, latents,
        )

    def _run(
        self, params, prompt_ids, negative_ids, plucker, F_mats, rng,
        latents=None, *, num_inference_steps, guidance_scale, decode,
    ):
        m = self.m
        sched_state = m.scheduler.set_timesteps(num_inference_steps)
        V, F, H, W, _ = plucker.shape
        assert V == 2, "SimplePipeline is the fixed 2-view sampler"
        h, w = H // 8, W // 8

        uncond, cond = encode_prompt(m, params["clip"], prompt_ids, negative_ids)
        # rows: [uncond-src, cond-src, uncond-tgt, cond-tgt]
        text = jnp.concatenate([uncond, cond, uncond, cond], axis=0)

        pose_feats = m.pose_encoder.apply(params["pose"], plucker)
        # chunk-ordered CFG duplication: [src, src, tgt, tgt]
        pose_feats = [
            jnp.concatenate([p[:1], p[:1], p[1:], p[1:]], axis=0) for p in pose_feats
        ]

        # F mats per flattened (video*cfg, frame) row
        F4 = jnp.concatenate(
            [F_mats[:1], F_mats[:1], F_mats[1:], F_mats[1:]], axis=0
        ).reshape(4 * F, 3, 3)
        epi_cond = EpiConditioning(
            F_mats=F4,
            video_length=F,
            F_mat_size=self.F_mat_size,
            rand_slope_ff=self.rand_slope_ff,
            cfg_factor=2,
            use_flash_kernel=self.use_flash_kernel,
        )

        rng, init_key = jax.random.split(rng)
        if latents is None:
            latents = jax.random.normal(init_key, (2, F, h, w, 4), jnp.float32)
        latents = latents * m.scheduler.init_noise_sigma

        def step(carry, t):
            lat, k = carry
            k, sk = jax.random.split(k)
            lat_in = jnp.concatenate([lat[:1], lat[:1], lat[1:], lat[1:]], axis=0)
            lat_in = m.scheduler.scale_model_input(lat_in, t)
            eps, _ = m.unet.apply(
                params["unet"], lat_in, t, text, pose_feats, epi_cond,
                rngs={"epi_slope": sk},
            )
            # chunk(4): uncond rows (0, 2), cond rows (1, 3)  (reference :642-646)
            eps_uncond = jnp.stack([eps[0], eps[2]])
            eps_text = jnp.stack([eps[1], eps[3]])
            eps_g = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            lat = m.scheduler.step(sched_state, eps_g, t, lat)
            return (lat, k), None

        (latents, _), _ = jax.lax.scan(step, (latents, rng), sched_state.timesteps)
        if not decode:
            return latents
        return decode_latents(m, params["vae"], latents)
