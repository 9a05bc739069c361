"""Adaptive robust loss with latent parameters as explicit pytree leaves.

JAX re-design of the adaptive Barron loss (reference:
third_party/robust_loss/adaptive.py:63-232 for the matrix form,
:323-538 for the image form). Semantics kept:

- per-channel latent alpha squashed to (alpha_lo, alpha_hi) by an affine
  sigmoid, latent scale mapped to (scale_lo, inf) by an affine softplus;
- fixing ``alpha_lo == alpha_hi`` / ``scale_lo == scale_init`` freezes the
  respective parameter to a constant (and removes its latent entirely);
- the image form transforms residuals RGB->sYUV, per-channel
  wavelet(CDF9/7)/DCT/PIXEL representation, then applies the
  per-coefficient NLL.

TPU-first differences: latents are explicit pytree leaves returned by
``init_params`` and threaded through ``__call__`` — they are part of the
training state and therefore *checkpointed and trained by construction*,
fixing the reference quirk where the loss's trainable variables lived
outside the model's checkpoint (reference: nlt/models/base.py:79-101 only
registers ``self.net``; SURVEY.md §5).
"""

import jax.numpy as jnp
import numpy as np

from ..ops import color, distribution, safe_math, wavelet
from ..ops.safe_math import students_t_nll


def _check_scale(scale_lo, scale_init):
    if not np.isscalar(scale_lo):
        raise ValueError("`scale_lo` must be a scalar")
    if not np.isscalar(scale_init):
        raise ValueError("`scale_init` must be a scalar")
    if not scale_lo > 0:
        raise ValueError("`scale_lo` must be > 0, got %g" % scale_lo)
    if not scale_init >= scale_lo:
        raise ValueError("`scale_init` must be >= `scale_lo`")


class AdaptiveLossFunction:
    """Adaptive NLL over rank-2 inputs [batch, channel]; one (alpha, scale)
    pair per channel."""

    def __init__(self, num_channels, alpha_lo=0.001, alpha_hi=1.999,
                 alpha_init=None, scale_lo=1e-5, scale_init=1.0,
                 dtype=jnp.float32):
        _check_scale(scale_lo, scale_init)
        if not np.isscalar(alpha_lo) or not np.isscalar(alpha_hi):
            raise ValueError("`alpha_lo`/`alpha_hi` must be scalars")
        if not alpha_lo >= 0:
            raise ValueError("`alpha_lo` must be >= 0, got %g" % alpha_lo)
        if not alpha_hi >= alpha_lo:
            raise ValueError("`alpha_hi` must be >= `alpha_lo`")
        if alpha_init is not None and alpha_lo != alpha_hi:
            if not (alpha_lo < alpha_init < alpha_hi):
                raise ValueError(
                    "`alpha_init` must be in (`alpha_lo`, `alpha_hi`)")

        self.num_channels = num_channels
        self.alpha_lo = alpha_lo
        self.alpha_hi = alpha_hi
        self.alpha_init = (
            (alpha_lo + alpha_hi) / 2.0 if alpha_init is None else alpha_init)
        self.scale_lo = scale_lo
        self.scale_init = scale_init
        self.dtype = dtype
        self._distribution = distribution.Distribution()

    @property
    def alpha_is_trainable(self):
        return self.alpha_lo != self.alpha_hi

    @property
    def scale_is_trainable(self):
        return self.scale_lo != self.scale_init

    def init_params(self):
        """Latent pytree; empty dict entries when parameters are frozen."""
        params = {}
        if self.alpha_is_trainable:
            latent_init = float(safe_math.inv_affine_sigmoid(
                jnp.asarray(self.alpha_init, jnp.float64),
                lo=self.alpha_lo, hi=self.alpha_hi))
            params["latent_alpha"] = jnp.full(
                (1, self.num_channels), latent_init, self.dtype)
        if self.scale_is_trainable:
            params["latent_scale"] = jnp.zeros(
                (1, self.num_channels), self.dtype)
        return params

    def alpha(self, params):
        if not self.alpha_is_trainable:
            return jnp.full((1, self.num_channels), self.alpha_lo, self.dtype)
        return safe_math.affine_sigmoid(
            params["latent_alpha"], lo=self.alpha_lo, hi=self.alpha_hi)

    def scale(self, params):
        if not self.scale_is_trainable:
            return jnp.full(
                (1, self.num_channels), self.scale_init, self.dtype)
        return safe_math.affine_softplus(
            params["latent_scale"], lo=self.scale_lo, ref=self.scale_init)

    def __call__(self, params, x):
        assert x.ndim == 2, "Expected [batch, channels], got %s" % (x.shape,)
        assert x.shape[1] == self.num_channels
        return self._distribution.nllfun(
            x, self.alpha(params), self.scale(params))


class StudentsTLossFunction:
    """NLL of a per-channel Student's t-distribution (reference:
    third_party/robust_loss/adaptive.py:235-320)."""

    def __init__(self, num_channels, scale_lo=1e-5, scale_init=1.0,
                 dtype=jnp.float32):
        _check_scale(scale_lo, scale_init)
        self.num_channels = num_channels
        self.scale_lo = scale_lo
        self.scale_init = scale_init
        self.dtype = dtype

    @property
    def scale_is_trainable(self):
        return self.scale_lo != self.scale_init

    def init_params(self):
        params = {"log_df": jnp.zeros((1, self.num_channels), self.dtype)}
        if self.scale_is_trainable:
            params["latent_scale"] = jnp.zeros(
                (1, self.num_channels), self.dtype)
        return params

    def df(self, params):
        return safe_math.exp_safe(params["log_df"])

    def scale(self, params):
        if not self.scale_is_trainable:
            return jnp.full(
                (1, self.num_channels), self.scale_init, self.dtype)
        return safe_math.affine_softplus(
            params["latent_scale"], lo=self.scale_lo, ref=self.scale_init)

    def __call__(self, params, x):
        assert x.ndim == 2 and x.shape[1] == self.num_channels
        return students_t_nll(x, self.df(params), self.scale(params))


class AdaptiveImageLossFunction:
    """Adaptive NLL over image residuals (N, H, W, C).

    Pipeline (reference: third_party/robust_loss/adaptive.py:455-514):
    RGB -> sYUV (volume-preserving) -> per-channel spatial representation
    (CDF9/7 / LeGall5/3 wavelets with per-level rescale, DCT, or PIXEL)
    -> flatten to (N, H*W*C) -> per-coefficient adaptive NLL -> reshape
    back to (N, H, W, C).
    """

    def __init__(self, image_size, color_space="YUV",
                 representation="CDF9/7", wavelet_num_levels=5,
                 wavelet_scale_base=1.0, use_students_t=False,
                 dtype=jnp.float32, **kwargs):
        if color_space not in ("RGB", "YUV"):
            raise ValueError("Unsupported color space %r" % color_space)
        valid_reps = wavelet.generate_filters() + ["DCT", "PIXEL"]
        if representation not in valid_reps:
            raise ValueError("Unsupported representation %r" % representation)
        assert len(image_size) == 3
        if image_size[2] != 3:
            assert color_space == "RGB"

        self.image_size = tuple(image_size)
        self.color_space = color_space
        self.representation = representation
        self.wavelet_num_levels = wavelet_num_levels
        self.wavelet_scale_base = wavelet_scale_base
        self.use_students_t = use_students_t
        num_channels = int(np.prod(image_size))
        if use_students_t:
            self.lossfun = StudentsTLossFunction(
                num_channels, dtype=dtype, **kwargs)
        else:
            self.lossfun = AdaptiveLossFunction(
                num_channels, dtype=dtype, **kwargs)

    def init_params(self):
        return self.lossfun.init_params()

    def alpha(self, params):
        assert not self.use_students_t
        return self.lossfun.alpha(params).reshape(self.image_size)

    def df(self, params):
        assert self.use_students_t
        return self.lossfun.df(params).reshape(self.image_size)

    def scale(self, params):
        return self.lossfun.scale(params).reshape(self.image_size)

    def transform_to_mat(self, x):
        """Color + spatial transform, flattened to (N, H*W*C)."""
        assert x.ndim == 4
        h, w, c = self.image_size
        if self.color_space == "YUV":
            x = color.rgb_to_syuv(x)
        # (N, H, W, C) -> (N*C, H, W): each channel transformed separately.
        x_stack = jnp.transpose(x, (0, 3, 1, 2)).reshape(-1, h, w)
        if self.representation in wavelet.generate_filters():
            x_stack = wavelet.flatten(
                wavelet.rescale(
                    wavelet.construct(
                        x_stack, self.wavelet_num_levels,
                        self.representation),
                    self.wavelet_scale_base))
        elif self.representation == "DCT":
            x_stack = color.image_dct(x_stack)
        # 'PIXEL': identity.
        # (N*C, H, W) -> (N, H*W*C), channel-minor like the reference.
        x_mat = jnp.transpose(
            x_stack.reshape(-1, c, h, w), (0, 2, 3, 1)).reshape(-1, h * w * c)
        return x_mat

    def __call__(self, params, x):
        assert x.shape[1:] == self.image_size, (x.shape, self.image_size)
        h, w, c = self.image_size
        x_mat = self.transform_to_mat(x)
        loss_mat = self.lossfun(params, x_mat)
        return loss_mat.reshape(-1, h, w, c)
