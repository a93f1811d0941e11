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
                 rand_slope_ff: bool = True, use_flash_kernel: Optional[bool] = None,
                 mesh=None):
        """mesh: optional ("rows", "frames") jax.sharding.Mesh
        (cvd_tpu.parallel.inference_mesh) — shards the 4 CFG rows and the
        frame axis across devices inside the one jitted program. With the
        kernels enabled, attention ops run as per-shard Pallas kernels
        under shard_map with explicit collectives (parallel/shard_ops.py).
        """
        self.m = modules
        self.F_mat_size = F_mat_size
        self.rand_slope_ff = rand_slope_ff
        if use_flash_kernel is None:
            use_flash_kernel = jax.default_backend() == "tpu"
        self.use_flash_kernel = use_flash_kernel
        self.mesh = mesh
        self._jitted = {}

    def __call__(
        self,
        prompt_ids,  # [1, 77] int32
        negative_ids,  # [1, 77] int32
        plucker,  # [2, F_total, H, W, 6]
        F_mats,  # [2, F_total, 3, 3] folded pair mats (video-major)
        num_inference_steps: int = 25,
        guidance_scale: float = 8.5,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        decode: bool = True,
        multidiff_total_steps: int = 1,
        multidiff_overlaps: int = 12,
        window_length: Optional[int] = None,
        pab_config=None,
    ):
        """Returns images [2, F_total, H, W, 3] in [0,1] (or raw latents).

        With multidiff_total_steps > 1, videos longer than the model window
        are denoised with overlap-averaged sliding windows — the reference
        scaffolds this but force-disables it (pipeline_animation_epi.py:509);
        here it is functional. F_total = steps*(window-overlap)+overlap.

        pab_config: optional pipelines.pab.PABConfig — Pyramid Attention
        Broadcast: attention outputs cached in the scan carry and reused on
        statically scheduled steps (requires the UNet to be built with
        scan_identical_layers=False, and multidiff off).
        """
        rng = rng if rng is not None else jax.random.key(0)
        key = (num_inference_steps, float(guidance_scale), decode,
               latents is None, multidiff_total_steps, multidiff_overlaps,
               window_length, pab_config)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                partial(
                    self._run,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=float(guidance_scale),
                    decode=decode,
                    multidiff_total_steps=multidiff_total_steps,
                    multidiff_overlaps=multidiff_overlaps,
                    window_length=window_length,
                    pab_config=pab_config,
                )
            )
        from cvd_tpu.models import layers as _layers

        # trace-time switches: with a mesh, attention kernels run through
        # the shard_map wrappers (never as bare pallas_calls under GSPMD);
        # restore afterwards so later traces see their own settings
        prev = (_layers.FLASH_SPATIAL, _layers.SHARD_MESH)
        _layers.FLASH_SPATIAL = self.use_flash_kernel
        _layers.SHARD_MESH = self.mesh if self.use_flash_kernel else None
        try:
            return self._jitted[key](
                self.m.params_bundle(), prompt_ids, negative_ids, plucker,
                F_mats, rng, latents,
            )
        finally:
            _layers.FLASH_SPATIAL, _layers.SHARD_MESH = prev

    def _run(
        self, params, prompt_ids, negative_ids, plucker, F_mats, rng,
        latents=None, *, num_inference_steps, guidance_scale, decode,
        multidiff_total_steps=1, multidiff_overlaps=12, window_length=None,
        pab_config=None,
    ):
        m = self.m
        sched_state = m.scheduler.set_timesteps(num_inference_steps)
        V, F_total, H, W, _ = plucker.shape
        assert V == 2, "SimplePipeline is the fixed 2-view sampler"
        h, w = H // 8, W // 8
        if window_length is None:
            window_length = (
                F_total if multidiff_total_steps == 1
                else (F_total - multidiff_overlaps) // multidiff_total_steps
                + multidiff_overlaps
            )
        Fw = window_length
        stride = Fw - multidiff_overlaps
        assert multidiff_total_steps == 1 or (
            (multidiff_total_steps - 1) * stride + Fw == F_total
        ), "frames must equal steps*(window-overlap)+overlap"

        uncond, cond = encode_prompt(m, params["clip"], prompt_ids, negative_ids)
        # rows: [uncond-src, cond-src, uncond-tgt, cond-tgt]
        text = jnp.concatenate([uncond, cond, uncond, cond], axis=0)

        # cast to the UNet compute dtype: f32 features held across the whole
        # 25-step scan cost ~1.4 GB of HBM at 6 views (the UNet reads them
        # in bf16 anyway)
        pose_feats_full = jax.tree_util.tree_map(
            lambda p: p.astype(m.unet.config.dtype),
            m.pose_encoder.apply(params["pose"], plucker),
        )
        # chunk-ordered CFG duplication: [src, src, tgt, tgt]
        pose_feats_full = [
            jnp.concatenate([p[:1], p[:1], p[1:], p[1:]], axis=0)
            for p in pose_feats_full
        ]
        F4_full = jnp.concatenate(
            [F_mats[:1], F_mats[:1], F_mats[1:], F_mats[1:]], axis=0
        )  # [4, F_total, 3, 3]

        def window_cond(start):
            pf = [p[:, start : start + Fw] for p in pose_feats_full]
            F4 = F4_full[:, start : start + Fw].reshape(4 * Fw, 3, 3)
            cond_w = EpiConditioning(
                F_mats=F4,
                video_length=Fw,
                F_mat_size=self.F_mat_size,
                rand_slope_ff=self.rand_slope_ff,
                cfg_factor=2,
                use_flash_kernel=self.use_flash_kernel,
            )
            return pf, cond_w

        rng, init_key = jax.random.split(rng)
        if latents is None:
            latents = jax.random.normal(init_key, (2, F_total, h, w, 4), jnp.float32)
        latents = latents * m.scheduler.init_noise_sigma

        # overlap-average weights (reference mask_full, :609-653)
        counts = jnp.zeros((F_total,))
        for widx in range(multidiff_total_steps):
            s = widx * stride
            counts = counts.at[s : s + Fw].add(1.0)
        inv_counts = (1.0 / counts)[None, :, None, None, None]

        from cvd_tpu.parallel import constrain

        def eps_window(lat_w, t, sk, pf, cond_w, pab_flags=None,
                       pab_cache=None):
            lat_in = jnp.concatenate(
                [lat_w[:1], lat_w[:1], lat_w[1:], lat_w[1:]], axis=0
            )
            lat_in = constrain(lat_in, self.mesh, "rows", "frames")
            pf = [constrain(p, self.mesh, "rows", "frames") for p in pf]
            lat_in = m.scheduler.scale_model_input(lat_in, t)
            if pab_flags is None:
                eps, _ = m.unet.apply(
                    params["unet"], lat_in, t, text, pf, cond_w,
                    rngs={"epi_slope": sk},
                )
                cache_out = None
            else:
                (eps, _), mut = m.unet.apply(
                    {**params["unet"], "pab": pab_cache}, lat_in, t, text,
                    pf, cond_w, rngs={"epi_slope": sk}, pab=pab_flags,
                    mutable=["pab"],
                )
                cache_out = mut["pab"]
            # chunk(4): uncond rows (0, 2), cond rows (1, 3)  (reference :642-646)
            eps_uncond = jnp.stack([eps[0], eps[2]])
            eps_text = jnp.stack([eps[1], eps[3]])
            return eps_uncond + guidance_scale * (eps_text - eps_uncond), \
                cache_out

        if pab_config is None:
            def step(carry, t):
                lat, k = carry
                eps_full = jnp.zeros_like(lat)
                for widx in range(multidiff_total_steps):
                    s = widx * stride
                    k, sk = jax.random.split(k)
                    pf, cond_w = window_cond(s)
                    eps_w, _ = eps_window(lat[:, s : s + Fw], t, sk, pf, cond_w)
                    eps_full = eps_full.at[:, s : s + Fw].add(eps_w)
                eps_full = eps_full * inv_counts
                lat = m.scheduler.step(sched_state, eps_full, t, lat)
                return (lat, k), None

            (latents, _), _ = jax.lax.scan(
                step, (latents, rng), sched_state.timesteps)
        else:
            # Pyramid Attention Broadcast: per-class reuse masks are static
            # scan xs; every attention site's cached output rides the scan
            # carry as the "pab" variable collection (pipelines/pab.py)
            from cvd_tpu.pipelines.pab import CLASSES as _PAB_CLASSES
            from cvd_tpu.pipelines.pab import reuse_masks

            if multidiff_total_steps != 1:
                raise ValueError("PAB + multidiff windows is unsupported")
            masks_np = reuse_masks(num_inference_steps, pab_config)
            pab_xs = {c: jnp.asarray(masks_np[c]) for c in _PAB_CLASSES}
            pf0, cond0 = window_cond(0)
            flags0 = {c: jnp.zeros((), bool) for c in _PAB_CLASSES}

            def _probe(lat, sk):
                lat_in = jnp.concatenate(
                    [lat[:1], lat[:1], lat[1:], lat[1:]], axis=0
                )
                lat_in = m.scheduler.scale_model_input(
                    lat_in, sched_state.timesteps[0])
                return m.unet.apply(
                    params["unet"], lat_in, sched_state.timesteps[0], text,
                    pf0, cond0, rngs={"epi_slope": sk}, pab=flags0,
                    mutable=["pab"],
                )

            _, mut_sds = jax.eval_shape(_probe, latents, rng)
            cache0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), mut_sds["pab"])

            def step_pab(carry, xs):
                lat, k, cache = carry
                t, flags = xs
                k, sk = jax.random.split(k)
                pf, cond_w = window_cond(0)
                eps_w, cache = eps_window(lat, t, sk, pf, cond_w, flags, cache)
                lat = m.scheduler.step(sched_state, eps_w, t, lat)
                return (lat, k, cache), None

            (latents, _, _), _ = jax.lax.scan(
                step_pab, (latents, rng, cache0),
                (sched_state.timesteps, pab_xs))
        if not decode:
            return latents
        return decode_latents(m, params["vae"], latents)
