r"""The general robust loss rho(x, alpha, scale).

JAX re-design of "A General and Adaptive Robust Loss Function" (Barron,
arXiv:1701.03077); behavioral parity with the reference implementation
(reference: third_party/robust_loss/general.py:29-125), including the
numerically-safe general branch and the special cases
alpha in {-inf, 0, 2, +inf}:

    alpha = -inf : Welsch/Leclerc       alpha = 1 : Charbonnier
    alpha = -2   : Geman-McClure        alpha = 2 : L2
    alpha = 0    : Cauchy/Lorentzian

Elementwise, dtype-preserving, jit/grad/vmap-safe. `alpha` and `scale`
broadcast against `x`.
"""

import numpy as np
import jax.numpy as jnp

from . import safe_math


def lossfun(x, alpha, scale, approximate=False, epsilon=1e-6):
    dtype = x.dtype
    alpha = jnp.broadcast_to(jnp.asarray(alpha, dtype), x.shape)
    scale = jnp.broadcast_to(jnp.asarray(scale, dtype), x.shape)

    if approximate:
        # Fast approximate form; inaccurate as x and alpha approach zero.
        assert epsilon > np.finfo(np.float32).eps
        b = jnp.abs(alpha - 2.0) + epsilon
        d = jnp.where(alpha >= 0.0, alpha + epsilon, alpha - epsilon)
        return (b / d) * (
            jnp.power(jnp.square(x / scale) / b + 1.0, 0.5 * d) - 1.0)

    squared_scaled_x = jnp.square(x / scale)

    loss_two = 0.5 * squared_scaled_x
    loss_zero = safe_math.log1p_safe(0.5 * squared_scaled_x)
    loss_neginf = -jnp.expm1(-0.5 * squared_scaled_x)
    loss_posinf = safe_math.expm1_safe(0.5 * squared_scaled_x)

    # General branch, guarded so that division and pow stay finite even at
    # the special-case alphas (whose branches are selected above it). The
    # untaken branch must stay finite for all inputs or where()'s VJP turns
    # 0 * inf into NaN gradients, so +/-inf alphas are replaced by a finite
    # sentinel here.
    eps = jnp.asarray(np.finfo(np.float32).eps, dtype)
    alpha_fin = jnp.where(jnp.isfinite(alpha), alpha, jnp.ones_like(alpha))
    beta_safe = jnp.maximum(eps, jnp.abs(alpha_fin - 2.0))
    alpha_safe = jnp.where(
        alpha_fin >= 0.0, jnp.ones_like(alpha),
        -jnp.ones_like(alpha)) * jnp.maximum(eps, jnp.abs(alpha_fin))
    loss_otherwise = (beta_safe / alpha_safe) * (
        jnp.power(squared_scaled_x / beta_safe + 1.0, 0.5 * alpha_fin) - 1.0)

    inf = jnp.asarray(float("inf"), dtype)
    return jnp.where(
        alpha == -inf, loss_neginf,
        jnp.where(
            alpha == 0.0, loss_zero,
            jnp.where(
                alpha == 2.0, loss_two,
                jnp.where(alpha == inf, loss_posinf, loss_otherwise))))
