"""DDIM scheduler tests vs an independent numpy transcription of the
diffusers update rule (the reference's scheduler config:
configs/inference_config.yaml:58-63)."""
import numpy as np
import jax
import jax.numpy as jnp

from cvd_tpu.schedulers import DDIMScheduler


def np_ddim_tables(T=1000, b0=0.00085, b1=0.012):
    betas = np.linspace(b0, b1, T)
    return np.cumprod(1 - betas)


def test_timesteps_leading_spacing_with_offset():
    sched = DDIMScheduler()
    st = sched.set_timesteps(25)
    ts = np.asarray(st.timesteps)
    assert ts.shape == (25,)
    assert ts[0] == 961 and ts[-1] == 1  # 1000//25=40 stride, +1 offset
    assert np.all(np.diff(ts) == -40)


def test_step_matches_manual_formula():
    sched = DDIMScheduler()
    st = sched.set_timesteps(25)
    acp = np_ddim_tables()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 8)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 8)).astype(np.float32)

    for t in [961, 41, 1]:
        prev_t = t - 40
        a_t = acp[t]
        a_prev = acp[prev_t] if prev_t >= 0 else 1.0
        x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        got = np.asarray(
            sched.step(st, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(x))
        )
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_full_25_step_denoise_recovers_x0_for_linear_model():
    # With a model that returns the true noise, DDIM must reconstruct x0
    sched = DDIMScheduler()
    st = sched.set_timesteps(25)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4)).astype(np.float32)
    acp = np_ddim_tables()
    t0 = int(np.asarray(st.timesteps)[0])
    x = np.sqrt(acp[t0]) * x0 + np.sqrt(1 - acp[t0]) * eps

    def body(x, t):
        return sched.step(st, jnp.asarray(eps), t, x), None

    x_final, _ = jax.lax.scan(body, jnp.asarray(x), st.timesteps)
    np.testing.assert_allclose(np.asarray(x_final), x0, rtol=1e-3, atol=1e-3)


def test_add_noise_and_renoise_consistency():
    sched = DDIMScheduler()
    st = sched.set_timesteps(25)
    acp = np_ddim_tables()
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((3, 5)).astype(np.float32)
    eps = rng.standard_normal((3, 5)).astype(np.float32)
    ts = np.array([10, 500, 999])
    got = np.asarray(sched.add_noise(st, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(ts)))
    exp = (
        np.sqrt(acp[ts])[:, None] * x0 + np.sqrt(1 - acp[ts])[:, None] * eps
    )
    np.testing.assert_allclose(got, exp, rtol=2e-5, atol=2e-5)

    # renoise: x * sqrt(a_t/a_prev) + sqrt(1 - a_t/a_prev) * n
    t = 441
    n = rng.standard_normal((3, 5)).astype(np.float32)
    ratio = acp[t] / acp[t - 40]
    exp = x0 * np.sqrt(ratio) + np.sqrt(1 - ratio) * n
    got = np.asarray(sched.renoise(st, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(n)))
    np.testing.assert_allclose(got, exp, rtol=2e-5, atol=2e-5)


def test_eta_variance_path():
    sched = DDIMScheduler()
    st = sched.set_timesteps(25)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    out = sched.step(st, eps, jnp.asarray(601), x, eta=1.0, noise=n)
    assert np.isfinite(np.asarray(out)).all()
