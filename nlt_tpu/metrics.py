"""Image quality metrics: PSNR (luma, mask-capable), SSIM, LPIPS.

Replaces the xiuminglib metric classes the reference uses for evaluation
(reference: third_party/xiuminglib/xiuminglib/metric.py:105-257;
used from nlt/models/nlt.py:64,264-268). Host-side numpy for PSNR (it runs
in the vis path), JAX for SSIM/LPIPS.
"""

import numpy as np

_LUMA = np.array([0.299, 0.587, 0.114], np.float64)


class PSNR:
    """Luma PSNR with optional mask and dtype-aware dynamic range."""

    def __init__(self, dtype=np.float32, dynamic_range=None):
        if dynamic_range is None:
            dtype = np.dtype(dtype)
            if np.issubdtype(dtype, np.integer):
                dynamic_range = float(np.iinfo(dtype).max)
            else:
                dynamic_range = 1.0
        self.dynamic_range = dynamic_range

    def __call__(self, im1, im2, mask=None):
        im1 = np.asarray(im1, np.float64)
        im2 = np.asarray(im2, np.float64)
        assert im1.shape == im2.shape
        if im1.ndim == 3 and im1.shape[2] == 3:
            im1 = im1 @ _LUMA
            im2 = im2 @ _LUMA
        se = (im1 - im2) ** 2
        if mask is not None:
            mask = np.asarray(mask).astype(bool)
            if mask.ndim == 3:
                mask = mask[:, :, 0]
            se = se[mask]
        mse = float(np.mean(se))
        if mse == 0:
            return float("inf")
        return 10.0 * np.log10(self.dynamic_range ** 2 / mse)


class SSIM:
    """Structural similarity (higher is better), via the JAX kernel."""

    def __init__(self, dynamic_range=1.0):
        self.dynamic_range = dynamic_range

    def __call__(self, im1, im2):
        import jax.numpy as jnp
        from .losses.ssim import ssim as ssim_fn
        im1 = jnp.asarray(np.asarray(im1, np.float32))
        im2 = jnp.asarray(np.asarray(im2, np.float32))
        if im1.ndim == 2:
            im1 = im1[:, :, None]
            im2 = im2[:, :, None]
        if im1.ndim == 3:
            im1 = im1[None]
            im2 = im2[None]
        return float(ssim_fn(im1, im2, max_val=self.dynamic_range)[0])


class LPIPS:
    """Perceptual distance (lower is better). Pass `weights_npz` for
    canonical LPIPS weights; otherwise deterministic random features."""

    def __init__(self, weights_npz=None, seed=0):
        from .losses import lpips as lpips_mod
        import jax
        if weights_npz is not None:
            self._params = lpips_mod.load_weights(weights_npz)
        else:
            self._params = lpips_mod.init_params(jax.random.PRNGKey(seed))
        self._fn = lpips_mod.lpips

    def __call__(self, im1, im2):
        import jax.numpy as jnp
        im1 = jnp.asarray(np.asarray(im1, np.float32))[None] * 2.0 - 1.0
        im2 = jnp.asarray(np.asarray(im2, np.float32))[None] * 2.0 - 1.0
        return float(self._fn(self._params, im1, im2)[0])
