r"""The probability distribution induced by the general robust loss.

JAX re-design of the NLL layer of the Barron loss (reference:
third_party/robust_loss/distribution.py). The NLL is

    nllfun(x, alpha, scale) = lossfun(x, alpha, scale)
                              + log(scale) + log Z(alpha)

where the log-partition function log Z(alpha) is approximated by a cubic
Hermite spline over a hand-crafted curved reparameterization of alpha
(reference: distribution.py:88-129, 149-222).

The spline knots are NOT copied from the reference; they are regenerated
from scratch by numerically integrating Z(alpha) = \int exp(-rho(x, alpha,
1)) dx (tools/fit_partition_spline.py) and stored in
nlt_tpu/data/partition_spline.npz.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import cubic_spline, general_loss, safe_math

_SPLINE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "partition_spline.npz")


def partition_spline_curve(alpha):
    """Curved alpha reparameterization: roughly linear on [0, 4] with extra
    resolution near alpha=2, logarithmic beyond (reference:
    distribution.py:88-114). Continuously differentiable."""
    c = lambda z: jnp.asarray(z, alpha.dtype)  # noqa: E731
    return jnp.where(
        alpha < 4,
        (c(2.25) * alpha - c(4.5)) / (jnp.abs(alpha - c(2)) + c(0.25))
        + alpha + c(2),
        c(5) / c(18) * safe_math.log_safe(c(4) * alpha - c(15)) + c(8))


def inv_partition_spline_curve(x):
    """Inverse of partition_spline_curve (reference: distribution.py:117-129).

    Guarded so both branches stay finite for any non-negative input (the
    untaken branch would otherwise overflow under where()'s VJP)."""
    c = lambda z: jnp.asarray(z, x.dtype)  # noqa: E731
    x_lo = jnp.minimum(x, c(8.0))
    branch_lo = c(0.5) * x_lo + jnp.where(
        x_lo <= 4,
        c(1.25) - jnp.sqrt(jnp.maximum(
            c(1.5625) - x_lo + c(0.25) * jnp.square(x_lo), c(0.0))),
        c(-1.25) + jnp.sqrt(jnp.maximum(
            c(9.5625) - c(3.0) * x_lo + c(0.25) * jnp.square(x_lo), c(0.0))))
    branch_hi = c(3.75) + c(0.25) * safe_math.exp_safe(
        x * c(3.6) - c(28.8))
    return jnp.where(x < 8, branch_lo, branch_hi)


def numerical_base_partition_function(alpha, xmax=None):
    """Z(alpha) by brute-force numerical integration (float64, host-side).

    Replaces the reference's Meijer-G analytical form (reference:
    distribution.py:35-85, which exists only for unit tests) with direct
    quadrature of the defining integral. Accurate to ~1e-7 for the alphas
    the spline covers; used by the offline spline fitter and by tests.
    """
    from scipy import integrate

    alpha = float(alpha)
    if alpha == 0:
        return np.pi * np.sqrt(2)
    if alpha == 2:
        return np.sqrt(2 * np.pi)

    def rho(x):
        # Exact general loss in float64 (scale=1), computed in log space so
        # huge alphas can't overflow the pow.
        ssx = x * x
        if alpha == 0:
            return np.log1p(0.5 * ssx)
        b = abs(alpha - 2.0)
        d = alpha if alpha >= 0 else -max(1e-300, abs(alpha))
        log_term = 0.5 * alpha * np.log1p(ssx / b)
        return (b / d) * np.expm1(np.minimum(log_term, 700.0))

    f = lambda x: np.exp(-np.minimum(rho(x), 700.0))  # noqa: E731
    val, _ = integrate.quad(f, 0, np.inf, limit=400)
    return 2.0 * val


class Distribution:
    """Evaluates the NLL and samples from the general robust distribution."""

    def __init__(self, spline_path=_SPLINE_PATH):
        with np.load(spline_path, allow_pickle=False) as f:
            self._spline_x_scale = float(f["x_scale"])
            self._spline_values = np.array(f["values"])
            self._spline_tangents = np.array(f["tangents"])

    def log_base_partition_function(self, alpha):
        """Spline approximation of log Z(alpha), alpha >= 0
        (reference: distribution.py:149-179)."""
        dtype = alpha.dtype
        x = partition_spline_curve(alpha)
        return cubic_spline.interpolate1d(
            x * jnp.asarray(self._spline_x_scale, dtype),
            jnp.asarray(self._spline_values, dtype),
            jnp.asarray(self._spline_tangents, dtype))

    def nllfun(self, x, alpha, scale):
        """-log p(x | 0, alpha, scale) (reference: distribution.py:181-222).
        Requires alpha >= 0 and scale > 0 (not checked under jit)."""
        loss = general_loss.lossfun(x, alpha, scale, approximate=False)
        # Evaluate the spline on alpha's OWN shape (typically (1, C) per
        # channel) and let the addition broadcast — broadcasting first
        # would multiply the gather/Hermite work by the batch size when
        # alpha is trainable.
        log_partition = (
            jnp.log(jnp.asarray(scale, x.dtype))
            + self.log_base_partition_function(
                jnp.asarray(alpha, x.dtype)))
        return loss + jnp.broadcast_to(
            log_partition.astype(x.dtype), x.shape)

    def draw_samples(self, key, alpha, scale, n_rounds=64):
        """Rejection-sample the distribution (Algorithm 1 of the paper;
        reference: distribution.py:224-314).

        Each element of `alpha`/`scale` parameterizes its own distribution.
        TPU-first deviation: instead of a dynamic while-loop until all
        proposals are accepted, runs a static number of rejection rounds
        under lax.scan (static shapes; n_rounds=64 gives acceptance failure
        probability < 1e-9 per element for alpha in [0, 4]).
        """
        alpha = jnp.asarray(alpha)
        scale = jnp.asarray(scale)
        assert alpha.shape == scale.shape
        dtype = alpha.dtype
        shape = alpha.shape

        log_z = self.log_base_partition_function(alpha)

        def body(carry, k):
            samples, accepted = carry
            k1, k2 = jax.random.split(k)
            # Cauchy proposals with our sqrt(2) standardization convention.
            u = jax.random.uniform(
                k1, shape, dtype=dtype,
                minval=jnp.finfo(dtype).tiny, maxval=1.0)
            cauchy_sample = jnp.tan(np.pi * (u - 0.5)) * jnp.sqrt(2.0)
            nll = self.nllfun(
                cauchy_sample, alpha, jnp.asarray(1.0, dtype))
            nll_bound = general_loss.lossfun(
                cauchy_sample, jnp.asarray(0.0, dtype),
                jnp.asarray(1.0, dtype)) + log_z
            accept = jax.random.uniform(k2, shape, dtype=dtype) \
                <= jnp.exp(nll_bound - nll)
            take = accept & ~accepted
            samples = jnp.where(take, cauchy_sample, samples)
            return (samples, accepted | accept), None

        keys = jax.random.split(key, n_rounds)
        (samples, _), _ = jax.lax.scan(
            body, (jnp.zeros(shape, dtype), jnp.zeros(shape, bool)), keys)
        return samples * scale
