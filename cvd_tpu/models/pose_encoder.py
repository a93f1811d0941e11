"""CameraCtrl pose encoder: Plücker video -> multi-scale features.

Re-design of ``animatediff/models/pose_adaptor.py:248-329`` (CameraPoseEncoder)
with the reference config (configs/inference_config.yaml:34-46): pixel-
unshuffle x8, conv_in 384->320, then 4 stages of 2x (ResnetBlock + temporal
attention), channels (320, 640, 1280, 1280), avg-pool downsampling between
stages. Outputs one feature per stage at the UNet's 4 resolutions.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cvd_tpu.models.layers import Conv2d
from cvd_tpu.models.motion import TemporalTransformerBlock


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/f, W/f, C*f*f], matching torch.nn.PixelUnshuffle
    channel ordering (c, fh, fw) with channels-first semantics."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // factor, factor, W // factor, factor, C)
    # torch output channel layout: c * f * f with (c, fh, fw) ordering
    x = x.transpose(0, 1, 3, 5, 2, 4)  # N, H/f, W/f, C, fh, fw
    return x.reshape(N, H // factor, W // factor, C * factor * factor)


class PoseResnetBlock(nn.Module):
    """pose_adaptor.py:134-167 with config ksize=1, sk=True, use_conv=False:

    optional avg-pool down -> (1x1 in_conv if channels change) -> 3x3 conv
    -> relu -> 1x1 conv -> + skip.
    """

    in_channels: int
    out_channels: int
    down: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.down:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if self.in_channels != self.out_channels:
            x = Conv2d(self.out_channels, 1, 1, 0, dtype=self.dtype, name="in_conv")(x)
        h = Conv2d(self.out_channels, 3, 1, 1, dtype=self.dtype, name="block1")(x)
        h = nn.relu(h)
        h = Conv2d(self.out_channels, 1, 1, 0, dtype=self.dtype, name="block2")(h)
        return h + x


class CameraPoseEncoder(nn.Module):
    downscale_factor: int = 8
    channels: Sequence[int] = (320, 640, 1280, 1280)
    nums_rb: int = 2
    cin: int = 384
    temporal_attention_nhead: int = 8
    temporal_pe_max_len: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, plucker: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """plucker: [B, F, H, W, 6] -> tuple of 4 features [B, F, h, w, c]."""
        B, F, H, W, C = plucker.shape
        x = pixel_unshuffle(plucker.reshape(B * F, H, W, C), self.downscale_factor)
        assert x.shape[-1] == self.cin
        x = Conv2d(self.channels[0], 3, 1, 1, dtype=self.dtype, name="encoder_conv_in")(x)

        features = []
        for i, ch in enumerate(self.channels):
            for j in range(self.nums_rb):
                in_ch = x.shape[-1]
                down = j == 0 and i != 0
                x = PoseResnetBlock(
                    in_ch, ch, down, dtype=self.dtype,
                    name=f"encoder_down_conv_blocks_{i}_{j}",
                )(x)
                # temporal attention over frames at each pixel
                # (pixel-major token layout, see models/motion.py)
                n, h, w, c = x.shape
                tokens = jnp.swapaxes(x.reshape(B, F, h * w, c), 1, 2)
                tokens = TemporalTransformerBlock(
                    c,
                    self.temporal_attention_nhead,
                    num_attention_blocks=1,
                    pe_max_len=self.temporal_pe_max_len,
                    pose_cond_indices=(),
                    dtype=self.dtype,
                    name=f"encoder_down_attention_blocks_{i}_{j}",
                )(tokens)
                x = jnp.swapaxes(tokens, 1, 2).reshape(n, h, w, c)
            features.append(x.reshape(B, F, h, w, c))
        return tuple(features)
