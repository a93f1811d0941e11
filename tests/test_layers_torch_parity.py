"""Numerical parity of Flax primitives vs torch functional ops.

torch (CPU) is the oracle for conv/groupnorm/attention/geglu semantics so
imported PyTorch checkpoints reproduce reference activations.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from cvd_tpu.models import layers as L

RTOL, ATOL = 2e-4, 2e-4


def t2j_linear(w, b=None):
    p = {"kernel": jnp.asarray(w.T.numpy())}
    if b is not None:
        p["bias"] = jnp.asarray(b.numpy())
    return p


def t2j_conv(w, b=None):
    p = {"kernel": jnp.asarray(w.permute(2, 3, 1, 0).numpy())}
    if b is not None:
        p["bias"] = jnp.asarray(b.numpy())
    return p


def test_conv2d_matches_torch():
    torch.manual_seed(0)
    w = torch.randn(16, 8, 3, 3)
    b = torch.randn(16)
    x = torch.randn(2, 8, 10, 10)
    ref = tF.conv2d(x, w, b, stride=2, padding=1)

    mod = L.Conv2d(16, 3, 2, 1)
    params = {"params": {"Conv_0": t2j_conv(w, b)}}
    got = mod.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=RTOL, atol=ATOL
    )


def test_groupnorm_matches_torch():
    torch.manual_seed(1)
    C = 32
    gamma, beta = torch.randn(C), torch.randn(C)
    x = torch.randn(3, C, 6, 6)
    ref = tF.group_norm(x, 8, gamma, beta, eps=1e-6)
    mod = L.GroupNorm(num_groups=8, eps=1e-6)
    params = {
        "params": {"GroupNorm_0": {"scale": jnp.asarray(gamma.numpy()), "bias": jnp.asarray(beta.numpy())}}
    }
    got = mod.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=RTOL, atol=ATOL
    )


def test_attention_matches_torch_sdpa():
    torch.manual_seed(2)
    B, Lq, Lk, C, heads = 2, 12, 7, 64, 8
    wq, wk, wv = (torch.randn(C, C) * 0.05 for _ in range(3))
    wo, bo = torch.randn(C, C) * 0.05, torch.randn(C) * 0.1
    x = torch.randn(B, Lq, C)
    ctx = torch.randn(B, Lk, C)
    bias = torch.randn(B, Lq, Lk)

    q = (x @ wq.T).view(B, Lq, heads, -1).transpose(1, 2)
    k = (ctx @ wk.T).view(B, Lk, heads, -1).transpose(1, 2)
    v = (ctx @ wv.T).view(B, Lk, heads, -1).transpose(1, 2)
    ref = tF.scaled_dot_product_attention(q, k, v, attn_mask=bias[:, None])
    ref = ref.transpose(1, 2).reshape(B, Lq, C) @ wo.T + bo

    mod = L.Attention(query_dim=C, heads=heads, dim_head=C // heads, cross_attention_dim=C)
    params = {
        "params": {
            "to_q": t2j_linear(wq),
            "to_k": t2j_linear(wk),
            "to_v": t2j_linear(wv),
            "to_out_0": t2j_linear(wo, bo),
        }
    }
    got = mod.apply(
        params,
        jnp.asarray(x.numpy()),
        jnp.asarray(ctx.numpy()),
        bias=jnp.asarray(bias.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-3)


def test_geglu_feedforward_matches_torch():
    torch.manual_seed(3)
    C = 32
    w1, b1 = torch.randn(8 * C, C) * 0.05, torch.randn(8 * C) * 0.1
    w2, b2 = torch.randn(C, 4 * C) * 0.05, torch.randn(C) * 0.1
    x = torch.randn(2, 5, C)
    h = x @ w1.T + b1
    hh, gate = h.chunk(2, dim=-1)
    ref = (hh * tF.gelu(gate)) @ w2.T + b2

    mod = L.FeedForward(C)
    params = {"params": {"net_0_proj": t2j_linear(w1, b1), "net_2": t2j_linear(w2, b2)}}
    got = mod.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-3)


def test_resnet_block_matches_torch():
    torch.manual_seed(4)
    Cin, Cout, Ct = 32, 64, 48
    x = torch.randn(2, Cin, 8, 8)
    temb = torch.randn(2, Ct)

    g1, be1 = torch.randn(Cin), torch.randn(Cin)
    w1, b1 = torch.randn(Cout, Cin, 3, 3) * 0.05, torch.randn(Cout) * 0.1
    wt, bt = torch.randn(Cout, Ct) * 0.05, torch.randn(Cout) * 0.1
    g2, be2 = torch.randn(Cout), torch.randn(Cout)
    w2, b2 = torch.randn(Cout, Cout, 3, 3) * 0.05, torch.randn(Cout) * 0.1
    ws, bs = torch.randn(Cout, Cin, 1, 1) * 0.05, torch.randn(Cout) * 0.1

    h = tF.group_norm(x, 32, g1, be1, eps=1e-6)
    h = tF.silu(h)
    h = tF.conv2d(h, w1, b1, padding=1)
    h = h + (tF.silu(temb) @ wt.T + bt)[:, :, None, None]
    h = tF.group_norm(h, 32, g2, be2, eps=1e-6)
    h = tF.silu(h)
    h = tF.conv2d(h, w2, b2, padding=1)
    ref = tF.conv2d(x, ws, bs) + h

    mod = L.ResnetBlock2D(out_channels=Cout, temb_channels=Ct)
    params = {
        "params": {
            "norm1": {"scale": jnp.asarray(g1.numpy()), "bias": jnp.asarray(be1.numpy())},
            "conv1": {"Conv_0": t2j_conv(w1, b1)},
            "time_emb_proj": t2j_linear(wt, bt),
            "norm2": {"scale": jnp.asarray(g2.numpy()), "bias": jnp.asarray(be2.numpy())},
            "conv2": {"Conv_0": t2j_conv(w2, b2)},
            "conv_shortcut": {"Conv_0": t2j_conv(ws, bs)},
        }
    }
    got = mod.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), jnp.asarray(temb.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
    )


def test_upsample_nearest_matches_torch():
    torch.manual_seed(5)
    x = torch.randn(1, 8, 4, 4)
    w, b = torch.randn(8, 8, 3, 3) * 0.1, torch.randn(8) * 0.1
    ref = tF.conv2d(tF.interpolate(x, scale_factor=2, mode="nearest"), w, b, padding=1)
    mod = L.Upsample2D(8)
    params = {"params": {"conv": {"Conv_0": t2j_conv(w, b)}}}
    got = mod.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=RTOL, atol=ATOL
    )


def test_sinusoidal_time_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding with flip_sin_to_cos=True, shift=0
    t = np.array([0.0, 1.0, 500.0, 999.0])
    dim = 320
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    emb = t[:, None] * freqs[None]
    ref = np.concatenate([np.cos(emb), np.sin(emb)], -1)
    got = np.asarray(L.sinusoidal_time_embedding(jnp.asarray(t), dim))
    # f32 sin/cos of large phases: ~5e-5 abs error vs f64
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_temporal_positional_encoding_matches_torch_impl():
    import math

    d_model, max_len = 64, 32
    position = torch.arange(max_len).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = torch.zeros(1, max_len, d_model)
    pe[0, :, 0::2] = torch.sin(position * div_term)
    pe[0, :, 1::2] = torch.cos(position * div_term)
    got = np.asarray(L.temporal_positional_encoding(max_len, d_model))
    np.testing.assert_allclose(got, pe.numpy(), rtol=1e-5, atol=1e-6)
