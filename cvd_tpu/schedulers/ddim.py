"""DDIM scheduler, numerically matching diffusers' DDIMScheduler defaults
as configured by the reference (configs/inference_config.yaml:58-63:
1000 train steps, linear betas 0.00085 -> 0.012, steps_offset=1,
clip_sample=False) with epsilon prediction and set_alpha_to_one=True.

Written as a pytree-of-arrays + pure functions so a full sampling run is one
``lax.scan`` over timesteps — ``step`` takes traced timestep values.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DDIMState:
    """Static schedule tables (host-precomputed in f64, stored f32)."""

    alphas_cumprod: jnp.ndarray  # [num_train_timesteps]
    final_alpha_cumprod: jnp.ndarray  # scalar
    timesteps: jnp.ndarray  # [num_inference_steps], descending
    num_train_timesteps: int
    num_inference_steps: int

    def tree_flatten(self):
        leaves = (self.alphas_cumprod, self.final_alpha_cumprod, self.timesteps)
        aux = (self.num_train_timesteps, self.num_inference_steps)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    steps_offset: int = 1
    clip_sample: bool = False
    set_alpha_to_one: bool = True
    prediction_type: str = "epsilon"

    def _alphas_cumprod_np(self) -> np.ndarray:
        if self.beta_schedule == "linear":
            betas = np.linspace(
                self.beta_start, self.beta_end, self.num_train_timesteps, dtype=np.float64
            )
        elif self.beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    self.beta_start**0.5,
                    self.beta_end**0.5,
                    self.num_train_timesteps,
                    dtype=np.float64,
                )
                ** 2
            )
        else:
            raise ValueError(f"unsupported beta schedule {self.beta_schedule}")
        return np.cumprod(1.0 - betas)

    def set_timesteps(self, num_inference_steps: int) -> DDIMState:
        """Build the inference schedule (diffusers 'leading' spacing)."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        timesteps = (
            (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
        ).astype(np.int32) + self.steps_offset
        acp = self._alphas_cumprod_np()
        final = 1.0 if self.set_alpha_to_one else acp[0]
        return DDIMState(
            alphas_cumprod=jnp.asarray(acp, jnp.float32),
            final_alpha_cumprod=jnp.asarray(final, jnp.float32),
            timesteps=jnp.asarray(timesteps),
            num_train_timesteps=self.num_train_timesteps,
            num_inference_steps=num_inference_steps,
        )

    # -- pure per-step functions (safe inside jit / scan) --------------------

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample: jnp.ndarray, t=None) -> jnp.ndarray:
        return sample

    def step(
        self,
        state: DDIMState,
        model_output: jnp.ndarray,
        timestep: jnp.ndarray,
        sample: jnp.ndarray,
        eta: float = 0.0,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One DDIM update x_t -> x_{t-1} (diffusers DDIMScheduler.step).

        ``timestep`` may be a traced scalar int.
        """
        prev_timestep = (
            timestep - self.num_train_timesteps // state.num_inference_steps
        )
        alpha_prod_t = state.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0,
            state.alphas_cumprod[jnp.clip(prev_timestep, 0)],
            state.final_alpha_cumprod,
        )
        beta_prod_t = 1.0 - alpha_prod_t

        if self.prediction_type == "epsilon":
            pred_x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
            pred_epsilon = model_output
        elif self.prediction_type == "v_prediction":
            pred_x0 = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            pred_epsilon = alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
        else:
            raise ValueError(self.prediction_type)

        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

        if eta > 0.0:
            variance = self._variance(state, alpha_prod_t, alpha_prod_t_prev)
            std_dev_t = eta * variance**0.5
            pred_dir = (1.0 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * pred_epsilon
            prev_sample = alpha_prod_t_prev**0.5 * pred_x0 + pred_dir
            if noise is None:
                raise ValueError("eta > 0 requires noise")
            prev_sample = prev_sample + std_dev_t * noise
        else:
            pred_dir = (1.0 - alpha_prod_t_prev) ** 0.5 * pred_epsilon
            prev_sample = alpha_prod_t_prev**0.5 * pred_x0 + pred_dir
        return prev_sample

    @staticmethod
    def _variance(state: DDIMState, alpha_prod_t, alpha_prod_t_prev):
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1.0 - alpha_prod_t / alpha_prod_t_prev)

    def add_noise(
        self,
        state: DDIMState,
        original_samples: jnp.ndarray,
        noise: jnp.ndarray,
        timesteps: jnp.ndarray,
    ) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(acp) x0 + sqrt(1-acp) eps. timesteps: [B]."""
        acp = state.alphas_cumprod[timesteps]
        shape = acp.shape + (1,) * (original_samples.ndim - acp.ndim)
        acp = acp.reshape(shape)
        return acp**0.5 * original_samples + (1.0 - acp) ** 0.5 * noise

    def renoise(
        self,
        state: DDIMState,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """Re-noise x_{t-1} back to x_t for multistep recurrent denoising.

        x <- x * sqrt(a_t/a_{t-1}) + sqrt(1 - a_t/a_{t-1}) * eps
        (reference pipeline_animation_epi_advanced.py:700-705).
        """
        prev_timestep = (
            timestep - self.num_train_timesteps // state.num_inference_steps
        )
        alpha_prod_t = state.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0,
            state.alphas_cumprod[jnp.clip(prev_timestep, 0)],
            state.final_alpha_cumprod,
        )
        ratio = alpha_prod_t / alpha_prod_t_prev
        return sample * ratio**0.5 + (1.0 - ratio) ** 0.5 * noise
