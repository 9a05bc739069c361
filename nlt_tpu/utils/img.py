"""Image ops used across the framework — device (JAX) and host (numpy) paths.

Replaces the reference's nlt/util/img.py. Device-side functions are pure JAX
(jit/vmap/grad-safe, static shapes); host-side helpers take numpy arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import logging as logutil

logger = logutil.Logger(loggee="utils/img")


# ---- blending / corner trick ----

def alpha_blend(t1, alpha, t2=None):
    """t1 * alpha + t2 * (1 - alpha); t2 defaults to zeros
    (reference: nlt/util/img.py:74-89). Works for JAX and numpy inputs."""
    xp = jnp if isinstance(t1, jnp.ndarray) else np
    if t2 is None:
        return t1 * alpha
    return xp.multiply(t1, alpha) + xp.multiply(t2, 1 - alpha)


def set_left_top_corner(x, val=0.0):
    """Force pixel (0, 0) of every image in an NHWC batch to `val`.

    Background texels carry a (0, 0) warp target, so the resampler reads the
    background color from the top-left corner; zeroing it makes backgrounds
    black (reference: nlt/util/img.py:179-185, nlt/models/nlt.py:107-111).
    Implemented as a multiplicative/additive mask, which is jit- and
    grad-friendly (no scatter).
    """
    mask = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    mask = mask.at[:, 0, 0, :].set(0.0)
    y = x * mask
    if val != 0.0:
        add = jnp.zeros_like(mask).at[:, 0, 0, :].set(val)
        y = y + add
    return y


# ---- resize ----

def resize(x, new_h=None, new_w=None, method="linear"):
    """Bilinear resize of NHWC (JAX) or HxW(xC) (numpy) images, with
    aspect-ratio-preserving defaulting like the reference
    (reference: nlt/util/img.py:92-120).
    """
    is_jax = isinstance(x, jnp.ndarray)
    if is_jax and x.ndim == 4:
        h, w = x.shape[1], x.shape[2]
    else:
        h, w = x.shape[0], x.shape[1]

    if new_h is not None and new_w is not None:
        if int(h / w * new_w) != new_h:
            logger.warn(
                "Aspect ratio changed in resizing: original %s; new %s",
                (h, w), (new_h, new_w))
    elif new_h is None and new_w is not None:
        new_h = int(h / w * new_w)
    elif new_h is not None and new_w is None:
        new_w = int(w / h * new_h)
    else:
        raise ValueError("At least one of new height or width must be given")

    if is_jax and x.ndim == 4:
        if (new_h, new_w) == (h, w):
            return x
        out_shape = (x.shape[0], new_h, new_w, x.shape[3])
        return jax.image.resize(x, out_shape, method=method)
    # Host path
    xn = np.asarray(x, dtype=np.float32)
    squeeze = xn.ndim == 2
    if squeeze:
        xn = xn[:, :, None]
    out = np.asarray(jax.image.resize(
        jnp.asarray(xn), (new_h, new_w, xn.shape[2]), method=method))
    if squeeze:
        out = out[:, :, 0]
    return out


def pack_vis(tree, linear_space=False):
    """Device-side packing of a dict of [0,1] vis images before they
    leave the device: uint8 (they are written as 8-bit PNGs anyway), or
    float16 for linear-space runs where pre-gamma quantization would
    band the darks. Cuts the device->host transfer 2-4x — the dominant
    epoch cost on thin-host/tunneled deployments (RESULTS.md).
    Trace-safe: call under jit."""
    def pack(v):
        if v.dtype == jnp.uint8:
            return v
        v = jnp.clip(v, 0.0, 1.0)
        if linear_space:
            return v.astype(jnp.float16)
        return jnp.round(v * 255.0).astype(jnp.uint8)

    return {k: pack(v) for k, v in tree.items()}


def vis_to_float01(x):
    """Undo the device-side vis packing (trainvali.pack_vis): uint8 ->
    [0, 1] float32, float16 -> float32; float32 passes through."""
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 255.0
    return np.asarray(x, np.float32)


def upsample2x(x):
    """2x bilinear upsampling of NHWC, matching
    tf.keras.layers.UpSampling2D(interpolation='bilinear') semantics
    (reference: nlt/networks/elements.py:42-48)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="linear")


# ---- color ----

_SRGB_LINEAR_THRES = 0.0031308
_SRGB_LINEAR_COEFF = 12.92
_SRGB_EXP_COEFF = 1.055
_SRGB_EXPONENT = 2.4


def linear2srgb(x):
    """Linear -> sRGB transfer for [0,1] inputs
    (reference: nlt/util/img.py:123-148)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    x = xp.clip(x, 0.0, 1.0)
    linear = x * _SRGB_LINEAR_COEFF
    # Clamp the pow input away from 0 so the gradient is finite at x == 0.
    safe_x = xp.maximum(x, 1e-12) if xp is jnp else x
    nonlinear = _SRGB_EXP_COEFF * (
        safe_x ** (1.0 / _SRGB_EXPONENT)) - (_SRGB_EXP_COEFF - 1.0)
    return xp.where(x <= _SRGB_LINEAR_THRES, linear, nonlinear)


def srgb2linear(x):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    x = xp.clip(x, 0.0, 1.0)
    linear = x / _SRGB_LINEAR_COEFF
    nonlinear = ((x + (_SRGB_EXP_COEFF - 1.0)) / _SRGB_EXP_COEFF) \
        ** _SRGB_EXPONENT
    return xp.where(x <= _SRGB_LINEAR_THRES * _SRGB_LINEAR_COEFF,
                    linear, nonlinear)


# BT.601 RGB->YUV, the same matrix tf.image.rgb_to_yuv uses, which the
# reference leans on for UVL2 and the sYUV robust-loss color space
# (reference: third_party/robust_loss/util.py:96-133).
_RGB2YUV = np.array([
    [0.299, 0.587, 0.114],
    [-0.14714119, -0.28886916, 0.43601035],
    [0.61497538, -0.51496512, -0.10001026]], dtype=np.float32).T

_YUV2RGB = np.linalg.inv(_RGB2YUV.astype(np.float64)).astype(np.float32)


def rgb_to_yuv(x):
    return x @ jnp.asarray(_RGB2YUV, x.dtype)


def yuv_to_rgb(x):
    return x @ jnp.asarray(_YUV2RGB, x.dtype)


def to_uint(x_0to1, dtype=np.uint8):
    x = np.clip(np.asarray(x_0to1), 0, 1)
    return (x * np.iinfo(dtype).max).astype(dtype)


# ---- filtering ----

def gaussian_kernel(sigma, kernel_size=None):
    if kernel_size is None:
        kernel_size = int(6 * sigma)
    x = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(x, x)
    k = np.exp(-(xx ** 2 + yy ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x, sigma, kernel_size=None):
    """Depthwise Gaussian blur of NHWC (reference: nlt/util/img.py:30-55).
    XLA maps the depthwise conv onto the MXU via feature_group_count."""
    k = jnp.asarray(gaussian_kernel(sigma, kernel_size), x.dtype)
    c = x.shape[3]
    # HWIO with feature_group_count=C: kernel (kh, kw, 1, C)
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


# ---- host-side composition helpers (vis only) ----

def hconcat(img_list, out_w=None):
    total = []
    for img in img_list:
        img = np.asarray(img)
        if total:
            prev = total[-1]
            if img.shape[0] != prev.shape[0]:
                img = resize(img, new_h=prev.shape[0])
        total.append(img)
    out = np.hstack(total)
    if out_w is not None:
        out = resize(out, new_w=out_w)
    return out


def rot90(img, counterclockwise=False):
    """90-degree rotation (host or device arrays;
    reference: nlt/util/img.py:167-176)."""
    xp = jnp if isinstance(img, jnp.ndarray) else np
    k = 1 if counterclockwise else 3
    return xp.rot90(img, k=k)


def put_text(img, text, font_size_ratio=0.06, top_left_ratio=(0.05, 0.05),
             color=(1, 1, 1)):
    """Stamp text onto a uint8/float image (PIL-based; replaces the
    reference's cv2.putText, nlt/util/img.py:201-212)."""
    from PIL import Image, ImageDraw, ImageFont
    arr = np.asarray(img)
    was_float = arr.dtype.kind == "f"
    if was_float:
        arr = (np.clip(arr, 0, 1) * 255).round().astype(np.uint8)
    im = Image.fromarray(arr)
    draw = ImageDraw.Draw(im)
    h, w = arr.shape[:2]
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
            max(8, int(font_size_ratio * h)))
    except Exception:
        font = ImageFont.load_default()
    xy = (int(top_left_ratio[0] * w), int(top_left_ratio[1] * h))
    draw.text(xy, text, fill=tuple(int(255 * c) for c in color), font=font)
    out = np.asarray(im)
    if was_float:
        out = out.astype(np.float32) / 255.0
    return out


def embed_into(inset, img, inset_scale=0.2):
    """Paste a (PIL or array) inset into the top-right corner of `img`,
    using the inset's alpha as mask (reference: nlt/util/img.py:226-234).
    """
    from PIL import Image
    if not hasattr(inset, "size"):
        inset = Image.fromarray(np.asarray(inset))
    inset_h = int(inset_scale * img.shape[0])
    inset_w = int(inset_h / inset.size[1] * inset.size[0])
    inset = inset.resize((inset_w, inset_h))
    bg = Image.fromarray(np.asarray(img))
    mask = inset if inset.mode == "RGBA" else None
    bg.paste(inset, (bg.size[0] - inset.size[0], 0), mask)
    return np.array(bg)


def frame_image(img, rgb=(0, 0, 1), width=4):
    img = np.array(img)
    val = np.array(rgb, dtype=img.dtype) * np.iinfo(img.dtype).max
    img[:width], img[-width:] = val, val
    img[:, :width], img[:, -width:] = val, val
    return img
