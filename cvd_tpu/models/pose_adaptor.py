"""PoseAdaptor — pose encoder + UNet as one callable (training-time wrapper).

API parity with the reference's nn.Module wrapper
(``animatediff/models/pose_adaptor.py:81-104``) that DDP wraps
(train_epi_control.py:261,349). In cvd_tpu the training step already calls
the pieces directly (train/train_step.py); this wrapper provides the same
single-call surface for users porting code.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cvd_tpu.models.epi import EpiConditioning
from cvd_tpu.pipelines.common import PipelineModules


class PoseAdaptor:
    def __init__(self, modules: PipelineModules, F_mat_size: int = 256,
                 rand_slope_ff: bool = True):
        self.m = modules
        self.F_mat_size = F_mat_size
        self.rand_slope_ff = rand_slope_ff

    def __call__(
        self,
        noisy_latents: jnp.ndarray,  # [B, F, h, w, 4]
        timesteps: jnp.ndarray,  # [B]
        encoder_hidden_states: jnp.ndarray,  # [B, L, C]
        pose_embedding: Optional[jnp.ndarray] = None,  # [B, F, H, W, 6]
        F_mats: Optional[jnp.ndarray] = None,  # [B, F, 3, 3]
        H_mats: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        unet_params=None,
        pose_encoder_params=None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """-> (noise_pred, auxiliary)."""
        m = self.m
        B, F = noisy_latents.shape[:2]
        pose_features = None
        if pose_embedding is not None:
            pose_features = m.pose_encoder.apply(
                pose_encoder_params or m.pose_encoder_params, pose_embedding
            )
        cond = EpiConditioning(
            F_mats=F_mats.reshape(B * F, 3, 3) if F_mats is not None else None,
            H_mats=H_mats.reshape(B * F, 3, 3) if H_mats is not None else None,
            video_length=F,
            F_mat_size=self.F_mat_size,
            rand_slope_ff=self.rand_slope_ff,
            cfg_factor=1,
        )
        rngs = {"epi_slope": rng} if rng is not None else {}
        pred, extras = m.unet.apply(
            unet_params or m.unet_params,
            noisy_latents, timesteps, encoder_hidden_states, pose_features, cond,
            rngs=rngs,
        )
        return pred, extras["auxiliary"]
