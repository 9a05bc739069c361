"""Distribution/NLL tests: spline accuracy vs direct quadrature, PDF
integrates to 1, samples match Cauchy/Normal at alpha 0/2 — re-derived from
the reference's test strategy (reference: third_party/robust_loss/
distribution_test.py:109-166)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.ops import distribution

jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def dist():
    return distribution.Distribution()


def test_partition_spline_curve_roundtrip(rng):
    alpha = jnp.asarray(np.sort(rng.uniform(0, 20, 256)))
    x = distribution.partition_spline_curve(alpha)
    back = distribution.inv_partition_spline_curve(x)
    np.testing.assert_allclose(back, alpha, rtol=1e-7, atol=1e-7)


def test_partition_spline_curve_anchors():
    got = distribution.partition_spline_curve(jnp.asarray([0.0, 2.0, 4.0]))
    np.testing.assert_allclose(got, [0.0, 4.0, 8.0], atol=1e-7)


@pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 8.0])
def test_log_partition_matches_quadrature(dist, alpha):
    expect = np.log(distribution.numerical_base_partition_function(alpha))
    got = float(dist.log_base_partition_function(jnp.asarray(alpha)))
    np.testing.assert_allclose(got, expect, atol=1e-5, rtol=1e-5)


def test_nll_is_loss_plus_log_partition(dist, rng):
    x = jnp.asarray(rng.uniform(-5, 5, 64))
    alpha = jnp.asarray(rng.uniform(0, 3, 64))
    scale = jnp.asarray(rng.uniform(0.5, 2, 64))
    from nlt_tpu.ops import general_loss
    nll = dist.nllfun(x, alpha, scale)
    loss = general_loss.lossfun(x, alpha, scale)
    log_z = dist.log_base_partition_function(alpha)
    np.testing.assert_allclose(
        nll, np.asarray(loss) + np.log(np.asarray(scale)) +
        np.asarray(log_z), rtol=1e-9)


@pytest.mark.parametrize("alpha", [0.0, 1.0, 2.0])
def test_pdf_integrates_to_one(dist, alpha):
    # Cauchy (alpha=0) tails decay like 1/x^2: need a much wider range.
    half_range = 20000 if alpha == 0.0 else 400
    x = np.linspace(-half_range, half_range, 800001)
    nll = np.asarray(dist.nllfun(
        jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(1.0)))
    integral = np.trapezoid(np.exp(-nll), x)
    np.testing.assert_allclose(integral, 1.0, atol=2e-3)


def test_nll_alpha_two_is_gaussian(dist):
    """At alpha=2 the distribution is N(0, scale^2 ... ) with our
    standardization: p(x) = exp(-x^2/(2 s^2)) / (s sqrt(2 pi))."""
    x = np.linspace(-3, 3, 101)
    s = 0.7
    nll = np.asarray(dist.nllfun(
        jnp.asarray(x), jnp.asarray(2.0), jnp.asarray(s)))
    expect = 0.5 * (x / s) ** 2 + np.log(s * np.sqrt(2 * np.pi))
    np.testing.assert_allclose(nll, expect, atol=1e-5)


def test_nll_alpha_zero_is_cauchy(dist):
    """At alpha=0 the distribution is Cauchy with gamma = sqrt(2) s."""
    x = np.linspace(-3, 3, 101)
    s = 1.3
    nll = np.asarray(dist.nllfun(
        jnp.asarray(x), jnp.asarray(0.0), jnp.asarray(s)))
    gamma = np.sqrt(2.0) * s
    expect = -np.log(gamma / np.pi / (x ** 2 + gamma ** 2))
    np.testing.assert_allclose(nll, expect, atol=1e-5)


def test_draw_samples_match_moments(dist):
    key = jax.random.PRNGKey(0)
    n = 20000
    # alpha=2 -> Normal(0, s^2): std == s with our convention? With
    # standardization, p ~ exp(-0.5 (x/s)^2) -> std = s.
    samples = dist.draw_samples(
        key, jnp.full((n,), 2.0), jnp.full((n,), 1.0))
    assert abs(float(jnp.std(samples)) - 1.0) < 0.05
    assert abs(float(jnp.mean(samples))) < 0.05


def test_draw_samples_cauchy_quantiles(dist):
    """alpha=0 samples should follow Cauchy(0, sqrt(2) s): check the
    interquartile range (robust for heavy tails): IQR = 2 gamma."""
    key = jax.random.PRNGKey(1)
    n = 20000
    samples = np.asarray(dist.draw_samples(
        key, jnp.zeros((n,)), jnp.full((n,), 1.0)))
    q25, q75 = np.percentile(samples, [25, 75])
    np.testing.assert_allclose(q75 - q25, 2 * np.sqrt(2.0), rtol=0.08)


def test_nll_gradients_finite(dist, rng):
    x = jnp.asarray(rng.uniform(-5, 5, 64))
    alpha = jnp.asarray(rng.uniform(0.05, 1.95, 64))
    scale = jnp.asarray(rng.uniform(0.5, 2, 64))

    g = jax.grad(lambda a, b, c: jnp.sum(dist.nllfun(a, b, c)),
                 argnums=(0, 1, 2))(x, alpha, scale)
    for gi in g:
        assert np.all(np.isfinite(gi))
