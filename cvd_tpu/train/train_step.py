"""The jitted data-parallel training step.

Replaces DDP + AMP GradScaler + manual clipping (train_epi_control.py:589-642)
with one jit over a `data`-sharded batch: XLA inserts the gradient
all-reduce from the output shardings; bf16 compute needs no loss scaling.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cvd_tpu.models.epi import EpiConditioning
from cvd_tpu.pipelines.common import PipelineModules, VAE_SCALE
from cvd_tpu.train.losses import epi_distance_loss, masked_mse_loss
from cvd_tpu.train.state import TrainState, trainable_mask


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    modules: PipelineModules,
    rng: jax.Array,
    frozen_params: Optional[Dict] = None,
    F_mat_size: int = 256,
    rand_slope_ff: bool = True,
    epi_loss_weight: float = 0.002,
    num_train_timesteps: int = 1000,
    use_flash_kernel: Optional[bool] = None,
    remat: bool = True,
):
    """One optimization step.

    batch keys (all device arrays, leading dim = 2*per-host videos, i.e. the
    folded pair is already flattened video-major like the reference's
    ``torch.cat(x.chunk(2, dim=1))`` at train_epi_control.py:516):
      latents          [B, F, h, w, 4]   (pre-encoded) OR
      pixel_values     [B, F, H, W, 3]   in [-1, 1]
      text_ids         [B, 77]
      plucker          [B, F, H, W, 6]
      F_mats           [B, F, 3, 3]      (or H_mats + warped_masks)
    """
    m = modules
    # frozen (non-trained) param trees; pass explicitly so jit treats them as
    # device buffers, not multi-GB compile-time constants
    if frozen_params is None:
        frozen_params = {
            "vae": m.vae_params, "clip": m.clip_params, "pose": m.pose_encoder_params,
        }
    sched = m.scheduler.set_timesteps(50)  # state only used for add_noise tables
    rng, eps_key, t_key, slope_key, vae_key = jax.random.split(rng, 5)

    if "latents" in batch:
        latents = batch["latents"]
    elif "latent_mean" in batch:
        # pre-encoded cache path (data/latents_cache.py): the cache stores
        # posterior MOMENTS; a fresh sample is drawn per iteration, so this
        # is the reference's per-step sampled encode minus the encoder conv
        # stack (train_epi_control.py:514-523)
        mean = batch["latent_mean"]
        std = jnp.exp(0.5 * batch["latent_logvar"])
        eps = jax.random.normal(vae_key, mean.shape, mean.dtype)
        latents = (mean + std * eps) * VAE_SCALE
    else:
        px = batch["pixel_values"]
        B, F = px.shape[:2]
        flat = px.reshape((B * F,) + px.shape[2:])
        # frame-chunked (lax.map) like the reference's 2b-fold encode under
        # no_grad (train_epi_control.py:514-523); bounds VAE temp memory
        from cvd_tpu.pipelines.common import encode_images

        z = encode_images(m, frozen_params["vae"], flat, vae_key)
        latents = z.reshape((B, F) + z.shape[1:])
    B, F = latents.shape[:2]

    noise = jax.random.normal(eps_key, latents.shape, latents.dtype)
    timesteps = jax.random.randint(t_key, (B,), 0, num_train_timesteps)
    noisy = m.scheduler.add_noise(sched, latents, noise, timesteps)

    text = m.clip.apply(frozen_params["clip"], batch["text_ids"])

    if "plucker" in batch:
        pose_feats = m.pose_encoder.apply(frozen_params["pose"], batch["plucker"])
        lora_scale = 1.0
    else:
        # unposed (WebVid-style) batch: no camera conditioning, and the
        # image LoRA is disabled for it (train_epi_control.py:580-581)
        pose_feats = None
        lora_scale = 0.0

    F_mats = batch.get("F_mats")
    H_mats = batch.get("H_mats")
    mask = batch.get("warped_masks")
    epi_cond = EpiConditioning(
        F_mats=F_mats.reshape(B * F, 3, 3) if F_mats is not None else None,
        H_mats=H_mats.reshape(B * F, 3, 3) if H_mats is not None else None,
        video_length=F,
        F_mat_size=F_mat_size,
        rand_slope_ff=rand_slope_ff,
        cfg_factor=1,
        # fused Pallas path is differentiable (custom_vjp in ops/epi_flash.py)
        use_flash_kernel=(
            jax.default_backend() == "tpu"
            if use_flash_kernel is None else use_flash_kernel
        ),
    )

    unet = m.unet
    if remat and not unet.config.remat:
        # recompute block activations in backward: full-size 16f/256px
        # training does not fit a 16 GB chip without it
        import dataclasses

        from cvd_tpu.models.unet import UNet3DConditionModel

        unet = UNet3DConditionModel(dataclasses.replace(unet.config, remat=True))

    # stop_gradient on every frozen UNet leaf: the cotangents become symbolic
    # zeros, so XLA never builds the frozen weight-gradient matmuls or their
    # f32 accumulation buffers — without this, differentiating the full tree
    # needs ~17.7 GB HBM at B=4/16f/256px and OOMs a 16 GB chip
    # derived from the SAME substrings the optimizer's multi_transform labels
    # were built from (stored on TrainState), so the stop_gradient mask and
    # the update mask cannot diverge
    freeze = trainable_mask(state.params, state.trainable_substrings)

    def loss_fn(params):
        params = jax.tree_util.tree_map(
            lambda p, keep: p if keep else jax.lax.stop_gradient(p),
            params, freeze,
        )
        pred, extras = unet.apply(
            params, noisy, timesteps, text, pose_feats, epi_cond,
            lora_scale=lora_scale,
            rngs={"epi_slope": slope_key},
        )
        loss = masked_mse_loss(
            pred.astype(jnp.float32), noise.astype(jnp.float32), mask
        )
        aux_loss = jnp.zeros((), jnp.float32)
        if extras["auxiliary"] is not None and F_mats is not None:
            aux_loss = epi_distance_loss(
                extras["auxiliary"], F_mats.reshape(B * F, 3, 3), F_mat_size
            )
            loss = loss + epi_loss_weight * aux_loss
        return loss, aux_loss

    (loss, aux_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    metrics = {"loss": loss, "epi_loss": aux_loss}
    return new_state, metrics


def make_jitted_train_step(modules: PipelineModules, mesh=None, **kwargs):
    """jit the step; with a mesh, donate state and shard the batch axis."""
    mesh_flash = False
    if mesh is not None:
        # the fused attention kernels run through the shard_map wrappers
        # (parallel/shard_ops.py): spatial/temporal are shard-local on the
        # ("data",) mesh, and the epipolar kernel all-gathers k/v over
        # 'data' so the cross-device 2-view kv swap routes globally; all
        # three carry custom_vjp rules, so the backward works too. The
        # divisibility checks inside the model fall back to XLA attention
        # per-op when the batch doesn't split into whole videos per device.
        flash = kwargs.get("use_flash_kernel")
        if flash is None:
            flash = jax.default_backend() == "tpu"
            kwargs["use_flash_kernel"] = flash
        mesh_flash = bool(flash)
    frozen = {
        "vae": modules.vae_params,
        "clip": modules.clip_params,
        "pose": modules.pose_encoder_params,
    }

    def step(state, batch, rng, frozen_params):
        return train_step(state, batch, modules, rng, frozen_params, **kwargs)

    from cvd_tpu.models import layers as _layers

    if mesh is None:
        jitted = jax.jit(step, donate_argnums=(0,))

        def run_single(state, batch, rng):
            # trace-time switches; save/restore so an exception (or this
            # call itself) can't leak flags into an unrelated later trace
            prev = (_layers.FLASH_SPATIAL, _layers.SHARD_MESH)
            _layers.FLASH_SPATIAL, _layers.SHARD_MESH = True, None
            try:
                return jitted(state, batch, rng, frozen)
            finally:
                _layers.FLASH_SPATIAL, _layers.SHARD_MESH = prev

        return run_single

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    frozen = jax.device_put(frozen, replicated)
    jitted = jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(replicated, batched, replicated, replicated),
        out_shardings=(replicated, replicated),
    )

    def run_sharded(state, batch, rng):
        prev = (_layers.FLASH_SPATIAL, _layers.SHARD_MESH)
        _layers.FLASH_SPATIAL = mesh_flash
        _layers.SHARD_MESH = mesh if mesh_flash else None
        try:
            return jitted(state, batch, rng, frozen)
        finally:
            _layers.FLASH_SPATIAL, _layers.SHARD_MESH = prev

    return run_sharded
