"""Property tests for the general robust loss, modeled on the reference's
test strategy (reference: third_party/robust_loss/general_test.py:104-358):
special-case alphas match closed forms, monotonicity/scale-invariance
properties, and gradients vs finite differences — all re-derived here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.ops import general_loss

jax.config.update("jax_enable_x64", True)


def _sample_inputs(rng, n=1024, dtype=np.float64):
    x = rng.uniform(-16, 16, n).astype(dtype)
    alpha = rng.uniform(-16, 16, n).astype(dtype)
    scale = rng.uniform(0.1, 10.0, n).astype(dtype)
    return x, alpha, scale


def test_alpha_two_is_l2(rng):
    x = rng.uniform(-10, 10, 256)
    scale = rng.uniform(0.1, 5, 256)
    got = general_loss.lossfun(jnp.asarray(x), 2.0, jnp.asarray(scale))
    np.testing.assert_allclose(got, 0.5 * (x / scale) ** 2, rtol=1e-10)


def test_alpha_zero_is_cauchy(rng):
    x = rng.uniform(-10, 10, 256)
    got = general_loss.lossfun(jnp.asarray(x), 0.0, 1.0)
    np.testing.assert_allclose(got, np.log1p(0.5 * x * x), rtol=1e-10)


def test_alpha_one_is_charbonnier(rng):
    x = rng.uniform(-10, 10, 256)
    got = general_loss.lossfun(jnp.asarray(x), 1.0, 1.0)
    expect = np.sqrt(x * x + 1.0) - 1.0
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_alpha_neg_two_is_geman_mcclure(rng):
    x = rng.uniform(-10, 10, 256)
    got = general_loss.lossfun(jnp.asarray(x), -2.0, 1.0)
    expect = 2.0 * x * x / (x * x + 4.0)
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_alpha_infinities(rng):
    x = rng.uniform(-4, 4, 256)
    got_neg = general_loss.lossfun(jnp.asarray(x), -np.inf, 1.0)
    np.testing.assert_allclose(
        got_neg, -np.expm1(-0.5 * x * x), rtol=1e-8)
    got_pos = general_loss.lossfun(jnp.asarray(x), np.inf, 1.0)
    np.testing.assert_allclose(
        got_pos, np.expm1(0.5 * x * x), rtol=1e-8)


def test_loss_is_zero_at_origin(rng):
    alpha = rng.uniform(-16, 16, 64)
    got = general_loss.lossfun(jnp.zeros(64), jnp.asarray(alpha), 1.0)
    np.testing.assert_allclose(got, np.zeros(64), atol=1e-12)


def test_loss_is_scale_invariant(rng):
    x, alpha, scale = _sample_inputs(rng)
    loss1 = general_loss.lossfun(
        jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(scale))
    mult = 1.0 + rng.uniform(0.1, 2.0)
    loss2 = general_loss.lossfun(
        jnp.asarray(mult * x), jnp.asarray(alpha), jnp.asarray(mult * scale))
    np.testing.assert_allclose(loss1, loss2, rtol=1e-8, atol=1e-10)


def test_loss_monotonic_in_alpha(rng):
    """rho(x, a1, 1) <= rho(x, a2, 1) whenever a1 <= a2."""
    x = rng.uniform(-10, 10, 512)
    alphas = np.sort(rng.uniform(-8, 8, (512, 2)), axis=1)
    l1 = general_loss.lossfun(jnp.asarray(x), jnp.asarray(alphas[:, 0]), 1.0)
    l2 = general_loss.lossfun(jnp.asarray(x), jnp.asarray(alphas[:, 1]), 1.0)
    assert np.all(np.asarray(l1) <= np.asarray(l2) + 1e-10)


def test_loss_and_grads_finite_everywhere(rng):
    x, alpha, scale = _sample_inputs(rng)
    alpha = np.concatenate(
        [alpha, [-np.inf, np.inf, 0.0, 2.0, 2.0 - 1e-12, 2.0 + 1e-12]])
    x = np.concatenate([x, [0.0, 0.0, 0.0, 0.0, 1.0, -1.0]])
    scale = np.concatenate([scale, [1.0] * 6])

    def f(x_, a_, s_):
        return jnp.sum(general_loss.lossfun(x_, a_, s_))

    loss = general_loss.lossfun(
        jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(scale))
    assert np.all(np.isfinite(loss))
    gx, ga, gs = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(scale))
    assert np.all(np.isfinite(gx))
    assert np.all(np.isfinite(ga))
    assert np.all(np.isfinite(gs))


def test_gradient_matches_finite_differences(rng):
    x = rng.uniform(-5, 5, 128)
    alpha = rng.uniform(-4, 4, 128)
    scale = rng.uniform(0.5, 2.0, 128)

    def f(x_):
        return jnp.sum(general_loss.lossfun(
            x_, jnp.asarray(alpha), jnp.asarray(scale)))

    g = np.asarray(jax.grad(f)(jnp.asarray(x)))
    eps = 1e-6
    for i in range(0, 128, 17):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (
            2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-6)


def test_approximate_form_close_away_from_zero(rng):
    x = rng.uniform(2, 10, 256)
    alpha = rng.uniform(-4, 4, 256)
    exact = general_loss.lossfun(jnp.asarray(x), jnp.asarray(alpha), 1.0)
    approx = general_loss.lossfun(
        jnp.asarray(x), jnp.asarray(alpha), 1.0, approximate=True)
    np.testing.assert_allclose(exact, approx, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_dtype_preserved(rng, dtype):
    x = rng.uniform(-4, 4, 32).astype(dtype)
    out = general_loss.lossfun(jnp.asarray(x), dtype(1.5), dtype(1.0))
    assert out.dtype == dtype
