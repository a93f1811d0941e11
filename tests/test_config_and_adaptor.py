"""Model-config translation + PoseAdaptor wrapper."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cvd_tpu.io.model_config import load_model_config


def test_reference_config_roundtrip():
    cfg, pe_kwargs, sched, extra = load_model_config("configs/inference_config.yaml")
    assert cfg.use_motion_module and cfg.use_epi_module
    assert cfg.motion_module_resolutions == (1, 2, 4, 8)
    assert cfg.motion_num_attention_blocks == 2
    assert cfg.epi_num_attention_blocks == 2
    assert cfg.motion_zero_initialize is False and cfg.epi_zero_initialize is True
    assert cfg.pose_cond_attn_indices == (0,)
    assert pe_kwargs["cin"] == 384 and pe_kwargs["temporal_pe_max_len"] == 16
    assert sched.beta_schedule == "linear" and sched.steps_offset == 1
    assert extra["epi_F_mat_size"] == 256


@pytest.mark.slow
def test_pose_adaptor_wrapper():
    import sys

    sys.path.insert(0, "tests")
    from tiny import tiny_modules

    from cvd_tpu.models.pose_adaptor import PoseAdaptor

    m = tiny_modules(8, 2)
    pa = PoseAdaptor(m, F_mat_size=64, rand_slope_ff=False)
    rng = np.random.default_rng(0)
    B, F = 2, 2
    pred, aux = pa(
        jnp.asarray(rng.standard_normal((B, F, 8, 8, 4)), jnp.float32),
        jnp.asarray([100, 500]),
        jnp.asarray(rng.standard_normal((B, 77, 24)), jnp.float32),
        pose_embedding=jnp.asarray(rng.standard_normal((B, F, 64, 64, 6)), jnp.float32),
        F_mats=jnp.asarray(rng.standard_normal((B, F, 3, 3)) * 1e-3, jnp.float32),
    )
    assert pred.shape == (B, F, 8, 8, 4)
    assert aux is None  # additional_channel == 0 in the tiny config
    assert np.isfinite(np.asarray(pred)).all()
