"""Numerically-safe scalar math used by the robust loss.

JAX re-design of the helper layer behind the Barron adaptive loss
(reference: third_party/robust_loss/util.py:24-93). All functions are
elementwise, dtype-preserving (float32/float64), and jit/grad-safe.
"""

import jax.numpy as jnp
from jax import nn


def log_safe(x):
    """log(x) with the input clamped to avoid inf -> nan in gradients."""
    return jnp.log(jnp.minimum(x, jnp.asarray(3e37, x.dtype)))


def log1p_safe(x):
    return jnp.log1p(jnp.minimum(x, jnp.asarray(3e37, x.dtype)))


def exp_safe(x):
    return jnp.exp(jnp.minimum(x, jnp.asarray(87.5, x.dtype)))


def expm1_safe(x):
    return jnp.expm1(jnp.minimum(x, jnp.asarray(87.5, x.dtype)))


def inv_softplus(y):
    """Inverse of softplus; linear passthrough above 87.5 to dodge overflow."""
    y = jnp.asarray(y)
    # Clamp the expm1 input so the untaken branch can't generate inf.
    return jnp.where(y > 87.5, y, jnp.log(jnp.expm1(jnp.minimum(y, 87.5))))


def logit(y):
    return -jnp.log(1.0 / y - 1.0)


def affine_sigmoid(real, lo=0.0, hi=1.0):
    """Maps reals to (lo, hi); 0 maps to (lo+hi)/2."""
    if not lo < hi:
        raise ValueError("`lo` (%g) must be < `hi` (%g)" % (lo, hi))
    return nn.sigmoid(real) * (hi - lo) + lo


def inv_affine_sigmoid(alpha, lo=0.0, hi=1.0):
    if not lo < hi:
        raise ValueError("`lo` (%g) must be < `hi` (%g)" % (lo, hi))
    return logit((jnp.asarray(alpha) - lo) / (hi - lo))


def affine_softplus(real, lo=0.0, ref=1.0):
    """Maps reals to (lo, inf); 0 maps to ref."""
    if not lo < ref:
        raise ValueError("`lo` (%g) must be < `ref` (%g)" % (lo, ref))
    real = jnp.asarray(real)
    shift = inv_softplus(jnp.asarray(1.0, real.dtype))
    return (ref - lo) * nn.softplus(real + shift) + lo


def inv_affine_softplus(scale, lo=0.0, ref=1.0):
    if not lo < ref:
        raise ValueError("`lo` (%g) must be < `ref` (%g)" % (lo, ref))
    scale = jnp.asarray(scale)
    shift = inv_softplus(jnp.asarray(1.0, scale.dtype))
    return inv_softplus((scale - lo) / (ref - lo)) - shift


def students_t_nll(x, df, scale):
    """NLL of a generalized Student's t-distribution
    (reference: third_party/robust_loss/util.py:88-93)."""
    import numpy as np
    from jax.scipy.special import gammaln
    return (
        0.5 * ((df + 1.0) * jnp.log1p((x / scale) ** 2.0 / df)
               + jnp.log(df))
        + jnp.log(jnp.abs(scale))
        + gammaln(0.5 * df) - gammaln(0.5 * df + 0.5)
        + jnp.asarray(0.5 * np.log(np.pi), x.dtype))
