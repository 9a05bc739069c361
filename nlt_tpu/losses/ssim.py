"""SSIM in pure JAX, matching tf.image.ssim defaults.

The reference's SSIM loss wraps tf.image.ssim (reference:
nlt/losses.py:75-87): 11x11 Gaussian window with sigma 1.5, k1=0.01,
k2=0.03, mean over channels and windows, one value per image.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size=11, sigma=1.5, dtype=jnp.float32):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), dtype)


def ssim(img1, img2, max_val=1.0, filter_size=11, filter_sigma=1.5,
         k1=0.01, k2=0.03):
    """Per-image SSIM of NHWC batches (returns shape (N,))."""
    assert img1.shape == img2.shape and img1.ndim == 4
    c = img1.shape[3]
    win = _gaussian_window(filter_size, filter_sigma, img1.dtype)
    kern = jnp.tile(win[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12

    lum = (2.0 * mu12 + c1) / (mu1_sq + mu2_sq + c1)
    cs = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    return jnp.mean(lum * cs, axis=(1, 2, 3))
