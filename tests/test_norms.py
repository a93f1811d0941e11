"""Fused GroupNorm kernel vs flax/torch-semantics reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from cvd_tpu.models.layers import FusedGroupNorm
from cvd_tpu.ops.norms import _reference, group_norm


@pytest.mark.parametrize("shape,groups", [((6, 16, 16, 128), 32), ((4, 256, 256), 8)])
def test_kernel_matches_reference(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    C = shape[-1]
    gamma = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    ref = _reference(x.reshape(shape[0], -1, C), gamma, beta, groups, 1e-5, None)
    got = group_norm(x, gamma, beta, groups, 1e-5, force_kernel=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(ref.shape), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_kernel_silu_fusion():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 128)), jnp.float32)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)
    plain = group_norm(x, gamma, beta, 32, 1e-5, force_kernel=True)
    fused = group_norm(x, gamma, beta, 32, 1e-5, act="silu", force_kernel=True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain) * (1 / (1 + np.exp(-np.asarray(plain)))),
        rtol=1e-5, atol=1e-5,
    )


def test_module_matches_flax_groupnorm():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 64)), jnp.float32)
    ref_mod = nn.GroupNorm(num_groups=16, epsilon=1e-5)
    fused_mod = FusedGroupNorm(num_groups=16, epsilon=1e-5)
    params = ref_mod.init(jax.random.key(0), x)
    # identical param structure -> same tree works for both
    ref = ref_mod.apply(params, x)
    got = fused_mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_flow():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)

    def loss_kernel(x, g, b):
        return jnp.sum(group_norm(x, g, b, 32, 1e-5, force_kernel=True) ** 2)

    def loss_ref(x, g, b):
        return jnp.sum(_reference(x.reshape(2, -1, 128), g, b, 32, 1e-5, None) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_, n in zip(gk, gr, "xgb"):
        np.testing.assert_allclose(
            np.asarray(a).reshape(np.asarray(b_).shape), np.asarray(b_),
            rtol=1e-4, atol=1e-4, err_msg=f"d{n}",
        )
