"""Color-space transforms for the robust image loss.

The volume-preserving scaled-YUV transform and orthonormal image DCT the
Barron loss imposes before its per-coefficient NLL (reference:
third_party/robust_loss/util.py:96-161).
"""

from jax.scipy import fft as jfft

from ..utils.img import rgb_to_yuv, yuv_to_rgb

# Scale that makes the BT.601 RGB->YUV matrix volume preserving (unit
# Jacobian determinant), so log-likelihoods keep meaning across the
# transform (reference: third_party/robust_loss/util.py:95-97).
VOLUME_PRESERVING_YUV_SCALE = 1.580227820074


def rgb_to_syuv(rgb):
    """Volume-preserving scaled YUV."""
    return VOLUME_PRESERVING_YUV_SCALE * rgb_to_yuv(rgb)


def syuv_to_rgb(yuv):
    return yuv_to_rgb(yuv / VOLUME_PRESERVING_YUV_SCALE)


def image_dct(image):
    """Orthonormal type-II DCT over axes 1 and 2 of an (N, H, W) stack."""
    d1 = jfft.dct(image, type=2, norm="ortho", axis=2)
    d2 = jfft.dct(d1, type=2, norm="ortho", axis=1)
    return d2


def image_idct(dct_x):
    """Inverse of image_dct (type-III DCT, i.e. idct of type 2)."""
    d1 = jfft.idct(dct_x, type=2, norm="ortho", axis=1)
    d2 = jfft.idct(d1, type=2, norm="ortho", axis=2)
    return d2
