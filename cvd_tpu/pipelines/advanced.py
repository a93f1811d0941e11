"""Advanced N-view pipeline — ``pipeline_animation_epi_advanced.py`` as one
jitted program.

Reference semantics reproduced (with their line refs):
* interleaved CFG: repeat_interleave(2) rows [v0-uncond, v0-cond, v1-uncond,
  ...], recombined via [0::2]/[1::2] (:672-691)
* random view pairing per UNet call, kv_index partner routing (:621-633)
* fundamental matrices for the sampled pairing computed on the fly — here a
  single batched einsum on device instead of a per-frame numpy loop (:636-647)
* multistep recurrent denoising with re-noising between repeats (:601-705)
* accumulate_step-averaged noise predictions (:605, :699)
* homography (H_mats) conditioning path for pose-free usage (:662-668)

Control flow is compiled: timesteps are a lax.scan, multistep a fixed-shape
inner scan with the final-timestep reduction handled by predication.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cvd_tpu.geometry.epipolar import fundamental_between_views
from cvd_tpu.models.epi import EpiConditioning
from cvd_tpu.pipelines.common import PipelineModules, decode_latents, encode_prompt


def random_pairing(key: jax.Array, num_views: int) -> jnp.ndarray:
    """partner[v] for a random perfect matching of views (:625-629)."""
    perm = jax.random.permutation(key, num_views)
    half = num_views // 2
    a, b = perm[:half], perm[half:]
    partner = jnp.zeros((num_views,), jnp.int32)
    partner = partner.at[a].set(b.astype(jnp.int32)).at[b].set(a.astype(jnp.int32))
    return partner


def interleave_cfg(x: jnp.ndarray) -> jnp.ndarray:
    """repeat_interleave(2, dim=0)."""
    return jnp.repeat(x, 2, axis=0)


class AdvancedPipeline:
    def __init__(self, modules: PipelineModules, F_mat_size: int = 256,
                 rand_slope_ff: bool = True, mono_direction: bool = False,
                 fix_firstframe: bool = False,
                 use_flash_kernel: Optional[bool] = None, mesh=None,
                 accumulate_batched: bool = False):
        """mesh: optional ("rows", "frames") mesh (parallel.inference_mesh)
        sharding the 2V CFG rows + frame axis; sharded runs use the XLA epi
        path (the Pallas kernel is single-device).

        accumulate_batched: run the accumulate_step pairings as ONE UNet
        call at batch 2V*acc (each group with its own pairing/F-mats/kv
        routing) instead of an inner lax.scan — trades activation HBM for
        fewer, larger MXU launches. N-view (c2w) path only."""
        self.m = modules
        self.F_mat_size = F_mat_size
        self.rand_slope_ff = rand_slope_ff
        self.mono_direction = mono_direction
        self.fix_firstframe = fix_firstframe
        self.accumulate_batched = accumulate_batched
        if use_flash_kernel is None:
            use_flash_kernel = jax.default_backend() == "tpu"
        self.use_flash_kernel = use_flash_kernel
        self.mesh = mesh
        self._jitted = {}

    def __call__(
        self,
        prompt_ids,  # [1, 77]
        negative_ids,  # [1, 77]
        plucker,  # [V, F, H, W, 6]
        c2w=None,  # [V*F, 4, 4] per-frame camera poses (on-device F mats)
        K_mats=None,  # [V*F, 3, 3]
        F_mats=None,  # [2, F, 3, 3] fixed pair mats (V==2 path)
        H_mats=None,  # [V, F, 3, 3] homography conditioning (pose-free)
        num_inference_steps: int = 25,
        guidance_scale: float = 8.5,
        multistep: int = 1,
        accumulate_step: int = 1,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        decode: bool = True,
        step_chunk: Optional[int] = None,
        pab_config=None,
    ):
        """step_chunk: run the denoising scan as ceil(T/step_chunk) separate
        executions of ONE compiled chunk program instead of a single
        whole-run program. The math is identical (the chunk boundary only
        splits the lax.scan's xs); use it when a single device-program
        execution would run for minutes — the remote-TPU worker was
        observed to crash partway through a ~430 s single execution
        (6 views x multistep 6 x accumulate 2 x 25 steps) while the same
        program at 2 steps ran fine.

        pab_config: optional pipelines.pab.PABConfig — Pyramid Attention
        Broadcast. Reuse flags are per OUTER timestep (all
        multistep x accumulate calls of a reuse step reuse together); the
        epi class defaults to recompute-every-call, which also keeps the
        per-call random re-pairing exact."""
        rng = rng if rng is not None else jax.random.key(0)
        V = plucker.shape[0]
        from cvd_tpu.models import layers as _layers

        # trace-time kernel switches (see pipelines/simple.py)
        prev = (_layers.FLASH_SPATIAL, _layers.SHARD_MESH)
        _layers.FLASH_SPATIAL = self.use_flash_kernel
        _layers.SHARD_MESH = self.mesh if self.use_flash_kernel else None
        try:
            if step_chunk:
                return self._call_chunked(
                    prompt_ids, negative_ids, plucker, c2w, K_mats, F_mats,
                    H_mats, num_inference_steps, float(guidance_scale),
                    multistep, accumulate_step, rng, latents, decode,
                    int(step_chunk), pab_config,
                )
            key = (
                num_inference_steps, float(guidance_scale), multistep,
                accumulate_step, decode, latents is None, F_mats is not None,
                H_mats is not None, c2w is not None, V, pab_config,
            )
            if key not in self._jitted:
                self._jitted[key] = jax.jit(
                    partial(
                        self._run,
                        num_inference_steps=num_inference_steps,
                        guidance_scale=float(guidance_scale),
                        multistep=multistep,
                        accumulate_step=accumulate_step,
                        decode=decode,
                        pab_config=pab_config,
                    ),
                    # plucker (arg 3) is dead after the one pose-encoder
                    # call; donating frees its ~150 MB f32 buffer (6 views
                    # is within ~230 MB of the v5e HBM limit)
                    donate_argnums=(3,),
                )
            return self._jitted[key](
                self.m.params_bundle(), prompt_ids, negative_ids, plucker,
                c2w, K_mats, F_mats, H_mats, rng, latents,
            )
        finally:
            _layers.FLASH_SPATIAL, _layers.SHARD_MESH = prev

    # ------------------------------------------------------------------ #

    def _prepare(self, params, prompt_ids, negative_ids, plucker, rng,
                 latents=None):
        """Text encode + pose encode + latent init (everything before the
        denoising scan). Shared by the whole-run jit and the chunked path."""
        m = self.m
        V, F, H, W, _ = plucker.shape
        h, w = H // 8, W // 8

        uncond, cond = encode_prompt(m, params["clip"], prompt_ids, negative_ids)
        # interleaved rows: [u, c] x V
        text = jnp.concatenate([uncond, cond], axis=0)
        text = jnp.tile(text, (V, 1, 1))

        # UNet compute dtype (see pipelines/simple.py — f32 features held
        # across the scan dominate HBM at high view counts)
        pose_feats = jax.tree_util.tree_map(
            lambda p: p.astype(m.unet.config.dtype),
            m.pose_encoder.apply(params["pose"], plucker),
        )
        # CFG interleave happens per step inside guided_eps: the 2V-row
        # duplicate is transient instead of held across the 25-step scan
        # (~0.7 GB at 6 views — the difference between fitting one chip
        # or not)

        rng, init_key = jax.random.split(rng)
        if latents is None:
            latents = jax.random.normal(init_key, (V, F, h, w, 4), jnp.float32)
        latents = latents * m.scheduler.init_noise_sigma
        return text, pose_feats, latents, rng

    def _run(
        self, params, prompt_ids, negative_ids, plucker, c2w, K_mats, F_mats,
        H_mats, rng, latents=None, *, num_inference_steps, guidance_scale,
        multistep, accumulate_step, decode, pab_config=None,
    ):
        m = self.m
        sched_state = m.scheduler.set_timesteps(num_inference_steps)
        text, pose_feats, latents, rng = self._prepare(
            params, prompt_ids, negative_ids, plucker, rng, latents
        )
        n_steps = len(sched_state.timesteps)
        out = self._sampling_scan(
            params, text, pose_feats, c2w, K_mats, F_mats, H_mats, latents,
            rng, sched_state.timesteps, jnp.arange(n_steps),
            total_steps=num_inference_steps, guidance_scale=guidance_scale,
            multistep=multistep, accumulate_step=accumulate_step,
            pab_config=pab_config,
        )
        latents = out[0]
        if not decode:
            return latents
        return decode_latents(m, params["vae"], latents)

    def _call_chunked(
        self, prompt_ids, negative_ids, plucker, c2w, K_mats, F_mats, H_mats,
        num_inference_steps, guidance_scale, multistep, accumulate_step, rng,
        latents, decode, step_chunk, pab_config=None,
    ):
        """Host-driven chunked sampling: one compiled chunk program executed
        ceil(T/step_chunk) times (equal-size chunks share the executable; a
        ragged final chunk compiles once more). See __call__ docstring.
        With PAB, the attention cache threads between chunk executions."""
        import numpy as np

        m = self.m
        params = self.m.params_bundle()
        V = plucker.shape[0]

        pkey = ("chunk-prep", latents is None, V, plucker.shape[1:])
        if pkey not in self._jitted:
            self._jitted[pkey] = jax.jit(self._prepare, donate_argnums=(3,))
        text, pose_feats, latents, rng = self._jitted[pkey](
            params, prompt_ids, negative_ids, plucker, rng, latents
        )

        sched_state = m.scheduler.set_timesteps(num_inference_steps)
        ts_all = np.asarray(sched_state.timesteps)
        n_steps = len(ts_all)
        cache = None
        for start in range(0, n_steps, step_chunk):
            stop = min(start + step_chunk, n_steps)
            first = start == 0
            ckey = ("chunk-scan", stop - start, float(guidance_scale),
                    multistep, accumulate_step, F_mats is not None,
                    H_mats is not None, c2w is not None, V, pab_config,
                    first and pab_config is not None)
            if ckey not in self._jitted:
                self._jitted[ckey] = jax.jit(
                    partial(
                        self._sampling_scan,
                        total_steps=num_inference_steps,
                        guidance_scale=float(guidance_scale),
                        multistep=multistep,
                        accumulate_step=accumulate_step,
                        pab_config=pab_config,
                    ),
                    donate_argnums=(7, 8),  # latents, rng carry between chunks
                )
            out = self._jitted[ckey](
                params, text, pose_feats, c2w, K_mats, F_mats, H_mats,
                latents, rng, jnp.asarray(ts_all[start:stop]),
                jnp.arange(start, stop), pab_cache=cache,
            )
            if pab_config is None:
                latents, rng = out
            else:
                latents, rng, cache = out
        if not decode:
            return latents
        dkey = ("chunk-decode", V)
        if dkey not in self._jitted:
            self._jitted[dkey] = jax.jit(
                lambda vp, z: decode_latents(m, vp, z))
        return self._jitted[dkey](params["vae"], latents)

    def _sampling_scan(
        self, params, text, pose_feats, c2w, K_mats, F_mats, H_mats, latents,
        rng, ts, t_idx, pab_cache=None, *, total_steps, guidance_scale,
        multistep, accumulate_step, pab_config=None,
    ):
        """The denoising scan over the given (timestep, index) slices; the
        whole-run jit passes all of them, the chunked path one slice per
        execution (is_last keys off the GLOBAL step index).

        With pab_config, returns (latents, rng, cache): reuse flags are
        indexed by the GLOBAL step, every UNet call of a reuse step reuses
        the "pab" collection carried through all three scan levels
        (timestep / multistep / accumulate)."""
        m = self.m
        sched_state = m.scheduler.set_timesteps(total_steps)
        V, F = latents.shape[:2]
        two_f = 2 * F
        row = jnp.arange(2 * V * F)
        row_v = row // two_f
        row_f = row % F

        def make_cond(pair_key):
            """EpiConditioning for one random pairing (or the fixed paths)."""
            if H_mats is not None:
                Hrows = H_mats.reshape(V * F, 3, 3)[row_v * F + row_f]
                return EpiConditioning(
                    H_mats=Hrows, video_length=F, F_mat_size=self.F_mat_size,
                    rand_slope_ff=self.rand_slope_ff, cfg_factor=2,
                    mono_direction=self.mono_direction,
                    fix_firstframe=self.fix_firstframe,
                    use_flash_kernel=self.use_flash_kernel,
                )
            if V == 2 and F_mats is not None:
                Frows = F_mats.reshape(V * F, 3, 3)[row_v * F + row_f]
                return EpiConditioning(
                    F_mats=Frows, video_length=F, F_mat_size=self.F_mat_size,
                    rand_slope_ff=self.rand_slope_ff, cfg_factor=2,
                    mono_direction=self.mono_direction,
                    fix_firstframe=self.fix_firstframe,
                    use_flash_kernel=self.use_flash_kernel,
                )
            # N-view: sample a pairing, compute F on device (:636-647)
            partner = random_pairing(pair_key, V)
            src_g = row_v * F + row_f
            dst_g = partner[row_v] * F + row_f
            Frows = fundamental_between_views(
                c2w[src_g], c2w[dst_g], K_mats[src_g], K_mats[dst_g]
            )
            kv_index = row + (partner[row_v] - row_v) * two_f
            return EpiConditioning(
                F_mats=Frows, kv_index=kv_index, video_length=F,
                F_mat_size=self.F_mat_size, rand_slope_ff=self.rand_slope_ff,
                cfg_factor=2, mono_direction=self.mono_direction,
                fix_firstframe=self.fix_firstframe,
                use_flash_kernel=self.use_flash_kernel,
            )

        from cvd_tpu.parallel import constrain

        def _apply_unet(lat_in, t, text_in, pf, cond_t, slope_key, flags,
                        cache):
            """One UNet call, PAB-aware: flags None -> plain apply (cache
            passes through untouched, () when PAB is off)."""
            if flags is None:
                eps, _ = m.unet.apply(
                    params["unet"], lat_in, t, text_in, pf, cond_t,
                    rngs={"epi_slope": slope_key},
                )
                return eps, cache
            (eps, _), mut = m.unet.apply(
                {**params["unet"], "pab": cache}, lat_in, t, text_in, pf,
                cond_t, rngs={"epi_slope": slope_key}, pab=flags,
                mutable=["pab"],
            )
            return eps, mut["pab"]

        def guided_eps(lat, t, key, flags, cache):
            pair_key, slope_key = jax.random.split(key)
            cond_t = make_cond(pair_key)
            lat_in = interleave_cfg(lat)
            lat_in = constrain(lat_in, self.mesh, "rows", "frames")
            lat_in = m.scheduler.scale_model_input(lat_in, t)
            pf = [
                constrain(interleave_cfg(p), self.mesh, "rows", "frames")
                for p in pose_feats
            ]
            eps, cache = _apply_unet(lat_in, t, text, pf, cond_t, slope_key,
                                     flags, cache)
            return eps[0::2] + guidance_scale * (eps[1::2] - eps[0::2]), cache

        def guided_eps_batched(lat, t, key, flags, cache):
            """accumulate_step pairings in ONE UNet call at batch 2V*acc:
            group g gets its own pairing/F-mats, kv routing offset into its
            own 2VF row block. Same per-group keys as the scan path, so the
            sampled pairings are identical between the two variants."""
            A = accumulate_step
            n_rows = 2 * V * F
            keys = jax.random.split(key, A)
            conds = []
            slope_key = None
            for g in range(A):
                pair_key, slope_key = jax.random.split(keys[g])
                conds.append(make_cond(pair_key))
            cond_t = EpiConditioning(
                F_mats=jnp.concatenate([c.F_mats for c in conds], axis=0),
                kv_index=jnp.concatenate(
                    [conds[g].kv_index + g * n_rows for g in range(A)], axis=0
                ),
                video_length=F, F_mat_size=self.F_mat_size,
                rand_slope_ff=self.rand_slope_ff, cfg_factor=2,
                mono_direction=self.mono_direction,
                fix_firstframe=self.fix_firstframe,
                use_flash_kernel=self.use_flash_kernel,
            )
            lat_in = m.scheduler.scale_model_input(interleave_cfg(lat), t)
            lat_in = jnp.tile(lat_in, (A,) + (1,) * (lat_in.ndim - 1))
            lat_in = constrain(lat_in, self.mesh, "rows", "frames")
            text_b = jnp.tile(text, (A, 1, 1))
            pf = [
                constrain(
                    jnp.tile(interleave_cfg(p), (A,) + (1,) * (p.ndim - 1)),
                    self.mesh, "rows", "frames",
                )
                for p in pose_feats
            ]
            eps, cache = _apply_unet(lat_in, t, text_b, pf, cond_t,
                                     slope_key, flags, cache)
            eps = eps.reshape((A, 2 * V) + eps.shape[1:])
            g_eps = eps[:, 0::2] + guidance_scale * (eps[:, 1::2] - eps[:, 0::2])
            return g_eps.astype(jnp.float32).sum(axis=0), cache

        use_batched_acc = (
            self.accumulate_batched and accumulate_step > 1
            and c2w is not None and H_mats is None and F_mats is None
        )

        if pab_config is not None:
            from cvd_tpu.pipelines.pab import CLASSES as _PAB_CLASSES
            from cvd_tpu.pipelines.pab import reuse_masks

            masks_np = reuse_masks(total_steps, pab_config)
            masks_j = {c: jnp.asarray(masks_np[c]) for c in _PAB_CLASSES}
            if pab_cache is None:
                flags0 = {c: jnp.zeros((), bool) for c in _PAB_CLASSES}
                fn = guided_eps_batched if use_batched_acc else guided_eps
                _, cache_sds = jax.eval_shape(
                    lambda lat, k: fn(lat, ts[0], k, flags0, {}),
                    latents, rng,
                )
                pab_cache = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), cache_sds)
        else:
            pab_cache = ()  # trivial carry placeholder

        def timestep_body(carry, scan_in):
            lat, key, cache = carry
            t, global_idx = scan_in
            is_last = global_idx == total_steps - 1
            flags = (None if pab_config is None else
                     {c: masks_j[c][global_idx] for c in masks_j})

            def mt_body(mt_carry, mt_idx):
                lat_mt, k, cache = mt_carry
                # only the first iteration runs on the last timestep (:602)
                active = jnp.logical_or(mt_idx == 0, jnp.logical_not(is_last))

                def run(lat_mt, k, cache):
                    k, acc_key = jax.random.split(k)
                    if accumulate_step == 1:
                        eps_sum, cache = guided_eps(lat_mt, t, acc_key,
                                                    flags, cache)
                    elif use_batched_acc:
                        eps_sum, cache = guided_eps_batched(
                            lat_mt, t, acc_key, flags, cache)
                    else:
                        # scan over pairings so the UNet body is traced ONCE
                        # regardless of accumulate_step: a Python loop
                        # inlines accumulate_step full UNet bodies into the
                        # multistep scan, and the doubled program reliably
                        # crashes the remote TPU compiler (observed at 4
                        # and 6 views with accumulate_step=2)
                        def acc_body(acc_carry, ak):
                            eps_acc, cache = acc_carry
                            eps_k, cache = guided_eps(lat_mt, t, ak, flags,
                                                      cache)
                            return (eps_acc + eps_k, cache), None

                        (eps_sum, cache), _ = jax.lax.scan(
                            acc_body, (jnp.zeros_like(lat_mt), cache),
                            jax.random.split(acc_key, accumulate_step),
                        )
                    lat_next = m.scheduler.step(
                        sched_state, eps_sum / accumulate_step, t, lat_mt
                    )
                    # re-noise unless this is the final multistep repeat
                    k, nk = jax.random.split(k)
                    renoise = jnp.logical_and(
                        mt_idx != multistep - 1, jnp.logical_not(is_last)
                    )
                    noise = jax.random.normal(nk, lat_next.shape, lat_next.dtype)
                    lat_re = m.scheduler.renoise(sched_state, lat_next, t, noise)
                    return jnp.where(renoise, lat_re, lat_next), k, cache

                lat_new, k_new, cache = run(lat_mt, k, cache)
                # inactive only on the last global step's extra multistep
                # iterations, after which the cache is never consumed — the
                # stale-cache write is harmless
                lat_mt = jnp.where(active, lat_new, lat_mt)
                return (lat_mt, k_new, cache), None

            (lat, key, cache), _ = jax.lax.scan(
                mt_body, (lat, key, cache), jnp.arange(multistep)
            )
            return (lat, key, cache), None

        (latents, rng, pab_cache), _ = jax.lax.scan(
            timestep_body, (latents, rng, pab_cache), (ts, t_idx)
        )
        if pab_config is None:
            return latents, rng
        return latents, rng, pab_cache
