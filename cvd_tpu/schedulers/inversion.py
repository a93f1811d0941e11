"""DDIM inversion — image latents -> noise trajectory.

Re-derivation of the inversion helpers the reference vendors in
``animatediff/utils/util.py:75-130`` (next_step / get_noise_pred_single /
ddim_inversion): deterministic reverse DDIM walking x_t -> x_{t+1}.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from cvd_tpu.schedulers.ddim import DDIMScheduler, DDIMState


def ddim_inversion_step(
    scheduler: DDIMScheduler,
    state: DDIMState,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """One inversion update x_t -> x_{t+stride} (util.py:75-87)."""
    stride = scheduler.num_train_timesteps // state.num_inference_steps
    next_timestep = jnp.minimum(
        timestep + stride, scheduler.num_train_timesteps - 1
    )
    alpha_t = jnp.where(
        timestep >= 0,
        state.alphas_cumprod[jnp.clip(timestep, 0)],
        state.final_alpha_cumprod,
    )
    alpha_next = state.alphas_cumprod[next_timestep]
    x0 = (sample - (1.0 - alpha_t) ** 0.5 * model_output) / alpha_t**0.5
    direction = (1.0 - alpha_next) ** 0.5 * model_output
    return alpha_next**0.5 * x0 + direction


def ddim_invert(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    scheduler: DDIMScheduler,
    state: DDIMState,
    latents: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full inversion loop (util.py:115-130) as a lax.scan.

    eps_fn(latents, t) -> predicted noise. Returns (final noisy latents,
    the per-step latent trajectory [num_steps, ...]).
    """
    stride = scheduler.num_train_timesteps // state.num_inference_steps
    # walk timesteps in ascending order, starting below the first one
    ts = state.timesteps[::-1] - stride

    def body(lat, t):
        eps = eps_fn(lat, jnp.clip(t, 0))
        lat = ddim_inversion_step(scheduler, state, eps, t, lat)
        return lat, lat

    final, traj = jax.lax.scan(body, latents, ts)
    return final, traj
