"""Math utilities: inverse-CDF sampling (NeRF-style).

Replaces the reference's nlt/util/math.py:19-40 (``sample_pdf``) with a
jit-safe JAX version (static sample counts, searchsorted instead of
dynamic gathers).
"""

import jax
import jax.numpy as jnp


def sample_pdf(bins, weights, n_samples, det=False, key=None, eps=1e-5):
    """Inverse-transform sample `n_samples` points per row from a piecewise-
    constant PDF over `bins`.

    Args:
        bins: (..., M+1) bin edges.
        weights: (..., M) unnormalized bin weights.
        n_samples: static int.
        det: deterministic (uniformly spaced CDF quantiles) vs random.
        key: PRNG key (required when det=False).

    Returns:
        (..., n_samples) samples.
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        assert key is not None, "Provide a PRNG key when det=False"
        u = jax.random.uniform(
            key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    idx = jnp.searchsorted(cdf[..., 1:], u, side="right") \
        if cdf.ndim == 1 else jax.vmap(
            lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
                cdf.reshape(-1, cdf.shape[-1])[:, 1:],
                u.reshape(-1, n_samples)).reshape(u.shape)
    below = jnp.clip(idx, 0, cdf.shape[-1] - 2)
    above = below + 1

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
