"""1-D cubic Hermite spline interpolation with linear extrapolation.

JAX version of the spline evaluator behind the robust loss's log-partition
approximation (reference: third_party/robust_loss/cubic_spline.py:21-97).
Knot x-coordinates are implicitly [0, 1, ..., len(values)-1].
"""

import jax.numpy as jnp


def interpolate1d(x, values, tangents):
    """Evaluate the spline at `x` (any shape); `values`/`tangents` are 1-D
    knot arrays of equal length. Queries outside [0, n-1] extrapolate
    linearly using the boundary tangents."""
    assert values.ndim == 1 and tangents.ndim == 1
    assert values.shape[0] == tangents.shape[0]
    dtype = x.dtype
    n = values.shape[0]

    x_lo = jnp.floor(jnp.clip(x, 0.0, n - 2)).astype(jnp.int32)
    x_hi = x_lo + 1

    t = x - x_lo.astype(dtype)
    t_sq = t * t
    t_cu = t * t_sq
    h01 = -2.0 * t_cu + 3.0 * t_sq
    h00 = 1.0 - h01
    h11 = t_cu - t_sq
    h10 = h11 - t_sq + t

    value_before = tangents[0] * t + values[0]
    value_after = tangents[-1] * (t - 1.0) + values[-1]

    v_lo = jnp.take(values, x_lo)
    v_hi = jnp.take(values, x_hi)
    m_lo = jnp.take(tangents, x_lo)
    m_hi = jnp.take(tangents, x_hi)
    value_mid = v_lo * h00 + v_hi * h01 + m_lo * h10 + m_hi * h11

    return jnp.where(t < 0.0, value_before,
                     jnp.where(t > 1.0, value_after, value_mid))
