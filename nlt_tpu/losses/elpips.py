"""E-LPIPS: ensemble-of-transformations LPIPS (Kettunen et al. 2019,
arXiv:1906.03973).

The reference's loss parser accepts ``'elpips'`` and calls
``losses.ELPIPS(bs)`` — a class its own losses module never defines
(latent NameError; reference: nlt/models/base.py:49-51). Here the loss
is actually implemented: LPIPS evaluated under random input
transformations applied IDENTICALLY to both images, averaged over
samples. The ensemble makes the metric robust to adversarial/overfit
artifacts that vanilla LPIPS can reward.

Transform family (a static-shape-friendly subset of the paper's
"ensemble": translation, mirroring, transposing, color permutation,
intensity scaling):

- integer translation in [0, 8)^2 (pad-reflect + dynamic crop);
- horizontal / vertical flips;
- spatial transpose (square images only);
- random permutation of the RGB channels;
- global intensity scale in [0.8, 1.0] (applied before the [-1,1]
  mapping, identically to both images).

Randomness is supplied per call via a JAX PRNG key (the training step
folds the step counter into a base key, so every step draws a fresh
ensemble sample; evaluation uses a fixed key for determinism).
"""

import jax
import jax.numpy as jnp

_PERMS = jnp.asarray(
    [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]],
    jnp.int32)

_MAX_SHIFT = 8


def _translate(img, oy, ox):
    """Reflect-pad by _MAX_SHIFT and crop at the (traced) offset."""
    n, h, w, c = img.shape
    padded = jnp.pad(
        img, ((0, 0), (0, _MAX_SHIFT), (0, _MAX_SHIFT), (0, 0)),
        mode="reflect")
    return jax.lax.dynamic_slice(
        padded, (0, oy, ox, 0), (n, h, w, c))


def random_transform(key, img0, img1):
    """One ensemble sample: the SAME random transform applied to both
    images. Returns (t_img0, t_img1)."""
    k_shift, k_flip, k_perm, k_scale = jax.random.split(key, 4)
    oy, ox = jax.random.randint(k_shift, (2,), 0, _MAX_SHIFT)
    fx, fy, ft = jax.random.bernoulli(k_flip, 0.5, (3,))
    perm = _PERMS[jax.random.randint(k_perm, (), 0, len(_PERMS))]
    scale = jax.random.uniform(
        k_scale, (), dtype=img0.dtype, minval=0.8, maxval=1.0)
    square = img0.shape[1] == img0.shape[2]

    def apply(img):
        img = _translate(img, oy, ox)
        img = jnp.where(fx, img[:, :, ::-1], img)
        img = jnp.where(fy, img[:, ::-1], img)
        if square:
            img = jnp.where(ft, jnp.swapaxes(img, 1, 2), img)
        img = jnp.take(img, perm, axis=3)
        return img * scale

    return apply(img0), apply(img1)
