"""Fused LayerNorm->matmul kernel vs torch LN + Linear oracle."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cvd_tpu.ops.ln_matmul import layer_norm_matmul


@pytest.mark.parametrize("force_kernel", [False, True])
@pytest.mark.parametrize("nproj", [1, 3])
def test_ln_matmul_matches_torch(force_kernel, nproj):
    rng = np.random.default_rng(0)
    T, C, K = 64, 128, 256
    x = rng.standard_normal((T, C)).astype(np.float32) * 2 + 0.5
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    ws = [rng.standard_normal((C, K)).astype(np.float32) * 0.1
          for _ in range(nproj)]
    bs = [rng.standard_normal(K).astype(np.float32) if i == 0 else None
          for i in range(nproj)]

    ln = torch.nn.LayerNorm(C)
    ln.weight.data = torch.from_numpy(gamma)
    ln.bias.data = torch.from_numpy(beta)
    with torch.no_grad():
        y = ln(torch.from_numpy(x))
        wants = []
        for w, b in zip(ws, bs):
            o = y @ torch.from_numpy(w)
            if b is not None:
                o = o + torch.from_numpy(b)
            wants.append(o.numpy())

    outs = layer_norm_matmul(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        [jnp.asarray(w) for w in ws],
        [None if b is None else jnp.asarray(b) for b in bs],
        eps=1e-5, force_kernel=force_kernel,
    )
    assert len(outs) == nproj
    for got, want in zip(outs, wants):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_ln_matmul_grad_matches_reference():
    import jax

    rng = np.random.default_rng(1)
    T, C, K = 16, 128, 128
    x = jnp.asarray(rng.standard_normal((T, C)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(C), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, K)) * 0.1, jnp.float32)

    def loss_fused(x, w):
        (o,) = layer_norm_matmul(x, gamma, beta, [w], [None],
                                 force_kernel=True)
        return jnp.sum(o**2)

    def loss_ref(x, w):
        (o,) = layer_norm_matmul(x, gamma, beta, [w], [None],
                                 force_kernel=False)
        return jnp.sum(o**2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
