"""Loss layer (L3): L1, L2, UVL2, SSIM, Barron, LPIPS.

Functional JAX re-design of the reference's loss classes (reference:
nlt/losses.py:27-169). Every loss is an object with

    init_params() -> pytree          (empty for stateless losses)
    __call__(params, gt, pred, keep_batch=False, weights=None) -> loss

Stateful losses (Barron's latent alpha/scale, LPIPS's network weights)
carry their state explicitly so it lives inside the training state pytree
and is checkpointed/trained by construction — unlike the reference, whose
robust-loss variables escaped both the checkpoint and
``trainable_variables`` (SURVEY.md §5).

The weighted-loss-string parser handles specs like ``'barron,1e+0lpips'``
(reference: nlt/models/base.py:63-77).
"""

import jax
import jax.numpy as jnp

from ..utils.img import alpha_blend, rgb_to_yuv
from . import adaptive as _adaptive
from . import elpips as _elpips
from . import lpips as _lpips
from . import ssim as _ssim
from ..utils import logging as logutil

logger = logutil.Logger(loggee="losses")


def _reduce(loss, keep_batch):
    """Mean over all non-batch dims (keep_batch) or everything."""
    if keep_batch:
        return jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
    return jnp.mean(loss)


class L1:
    """Mean absolute error (reference: nlt/losses.py:27-36)."""

    def init_params(self):
        return {}

    def __call__(self, params, gt, pred, keep_batch=False, weights=None):
        err = jnp.abs(gt - pred)
        if weights is not None:
            err = err * weights
        return _reduce(err, keep_batch)


class L2:
    """Mean squared error (reference: nlt/losses.py:39-53)."""

    def init_params(self):
        return {}

    def __call__(self, params, gt, pred, keep_batch=False, weights=None):
        err = jnp.square(gt - pred)
        if weights is not None:
            err = err * weights
        return _reduce(err, keep_batch)


class UVL2:
    """Chroma-only (UV of YUV) L2 on clipped inputs
    (reference: nlt/losses.py:56-72)."""

    def init_params(self):
        return {}

    def __call__(self, params, gt, pred, keep_batch=False, weights=None):
        gt_yuv = rgb_to_yuv(jnp.clip(gt, 0.0, 1.0))
        pred_yuv = rgb_to_yuv(jnp.clip(pred, 0.0, 1.0))
        err = jnp.square(gt_yuv[..., 1:] - pred_yuv[..., 1:])
        if weights is not None:
            err = err * weights
        return _reduce(err, keep_batch)


class SSIM:
    """(1 - SSIM) / 2 in [0, 1] (reference: nlt/losses.py:75-87)."""

    def __init__(self, dynamic_range=1.0):
        self.dynamic_range = dynamic_range

    def init_params(self):
        return {}

    def __call__(self, params, gt, pred, keep_batch=False, weights=None):
        if weights is not None:
            gt = alpha_blend(gt, weights)
            pred = alpha_blend(pred, weights)
        sim = _ssim.ssim(gt, pred, max_val=self.dynamic_range)
        loss = (1.0 - sim) / 2.0
        if keep_batch:
            return loss
        return jnp.mean(loss)


class Barron:
    """Adaptive robust image loss on the residual gt - pred.

    NLT settings (reference: nlt/losses.py:90-118): alpha fixed at 1
    (Charbonnier-like), scale fixed at 0.01, sYUV color space, CDF9/7
    wavelets, 5 levels, scale base 1. With these settings the loss has no
    latent parameters; pass trainable bounds to adapt alpha/scale.
    """

    def __init__(self, imw, imh, alpha=1.0, scale=0.01,
                 wavelet_scale_base=1.0, wavelet_num_levels=5,
                 color_space="YUV", representation="CDF9/7",
                 alpha_lo=None, alpha_hi=None, scale_lo=None):
        self.func = _adaptive.AdaptiveImageLossFunction(
            (imh, imw, 3),
            color_space=color_space,
            representation=representation,
            wavelet_num_levels=wavelet_num_levels,
            wavelet_scale_base=wavelet_scale_base,
            alpha_lo=alpha if alpha_lo is None else alpha_lo,
            alpha_hi=alpha if alpha_hi is None else alpha_hi,
            scale_lo=scale if scale_lo is None else scale_lo,
            scale_init=scale)

    def init_params(self):
        return self.func.init_params()

    def __call__(self, params, gt, pred, keep_batch=False, weights=None):
        if weights is not None:
            gt = alpha_blend(gt, weights)
            pred = alpha_blend(pred, weights)
        loss = self.func(params, gt - pred)  # NHWC of per-coefficient NLLs
        return _reduce(loss, keep_batch)


class LPIPS:
    """Perceptual loss; inputs in [0, 1], NHWC with 3 channels
    (reference: nlt/losses.py:121-169).

    `weights_npz` loads converted canonical LPIPS weights; otherwise a
    deterministic random-feature network is used (see losses/lpips.py).
    The network weights live in the loss params pytree but should be
    excluded from optimization (they are a frozen metric network); the
    model layer handles that via a stop-gradient at the call site.
    """

    # The gt branch is static per example (models may cache its
    # features — see extract_feats); subclasses with transform
    # randomness override this.
    cacheable_gt = True

    def __init__(self, per_ch=False, weights_npz=None, seed=0,
                 max_res=None):
        self.per_ch = per_ch
        self.weights_npz = weights_npz
        self.seed = seed
        # Optional: bilinearly downsample inputs above this resolution
        # before the AlexNet — LPIPS is the training step's compute hog
        # at 512^2 (RESULTS.md) and perceptual distances are
        # scale-tolerant. None keeps full resolution (reference parity).
        self.max_res = max_res
        if weights_npz is None:
            logger.warn(
                "LPIPS: no weights artifact configured; using a "
                "deterministic random-feature AlexNet. Values are a valid "
                "perceptual-style distance but NOT comparable to canonical "
                "LPIPS numbers.")

    def init_params(self):
        if self.weights_npz is not None:
            return _lpips.load_weights(self.weights_npz)
        return _lpips.init_params(jax.random.PRNGKey(self.seed))

    def _transform(self, img, weights=None):
        """The input transforms applied identically to gt and pred:
        optional alpha blend, optional max_res downsample, [0,1]->[-1,1].
        """
        if weights is not None:
            img = alpha_blend(img, weights)
        if self.max_res is not None:
            h, w = img.shape[1], img.shape[2]
            if max(h, w) > self.max_res:
                # Aspect-preserving: scale the LONG side to max_res.
                from ..utils.img import resize
                scale = self.max_res / max(h, w)
                img = resize(img, max(1, round(h * scale)),
                             max(1, round(w * scale)))
        return img * 2.0 - 1.0

    def extract_feats(self, params, img, weights=None):
        """Normalized AlexNet taps of a [0,1] NHWC image, ready to pass
        back as `gt_feats`. The ground truth is static per example, so
        caching these halves the AlexNet cost of every later step with
        bit-identical loss and gradients (the gt branch carries no
        gradient; see losses/lpips.features_normalized)."""
        assert not self.per_ch, "gt feature caching supports per_ch=False"
        params = jax.lax.stop_gradient(params)
        return _lpips.features_normalized(
            params, self._transform(img, weights))

    def __call__(self, params, gt, pred, keep_batch=False, weights=None,
                 gt_feats=None):
        assert pred.shape[3] == 3, (
            "Prediction must be (N, H, W, 3)")
        # The metric network is frozen: no gradients to its weights.
        params = jax.lax.stop_gradient(params)
        pred = self._transform(pred, weights)
        if gt_feats is not None:
            assert not self.per_ch
            pred_feats = _lpips.features_normalized(params, pred)
            loss = _lpips.lpips_from_feats(params, gt_feats, pred_feats)
            return loss if keep_batch else jnp.mean(loss)
        assert gt.shape[3] == 3, (
            "Ground truth must be (N, H, W, 3)")
        gt = self._transform(gt, weights)
        if self.per_ch:
            loss = 0.0
            for i in range(3):
                gt_ch = jnp.tile(gt[..., i:i + 1], (1, 1, 1, 3))
                pred_ch = jnp.tile(pred[..., i:i + 1], (1, 1, 1, 3))
                loss = loss + _lpips.lpips(params, pred_ch, gt_ch) / 3.0
        else:
            loss = _lpips.lpips(params, pred, gt)
        if keep_batch:
            return loss
        return jnp.mean(loss)


class ELPIPS(LPIPS):
    """Ensemble-of-transformations LPIPS (losses/elpips.py; the
    reference's parser accepts 'elpips' but its losses module never
    defines the class — implemented for real here).

    Stochastic: each call draws a fresh random transform per ensemble
    sample from `key` (the training step folds the step counter into a
    base key; evaluation passes nothing and gets a fixed seed). The gt
    branch changes with the transform, so the static-gt feature cache
    does not apply (cacheable_gt = False)."""

    stochastic = True
    cacheable_gt = False

    def __init__(self, n_samples=1, weights_npz=None, seed=0,
                 max_res=None):
        super().__init__(per_ch=False, weights_npz=weights_npz,
                         seed=seed, max_res=max_res)
        self.n_samples = n_samples

    def __call__(self, params, gt, pred, keep_batch=False, weights=None,
                 key=None):
        assert gt.shape[3] == 3 and pred.shape[3] == 3, (
            "Both ground truth and prediction must be (N, H, W, 3)")
        if weights is not None:
            gt = alpha_blend(gt, weights)
            pred = alpha_blend(pred, weights)
        if key is None:
            key = jax.random.PRNGKey(self.seed)
        params = jax.lax.stop_gradient(params)
        total = 0.0
        for i in range(self.n_samples):
            g, p = _elpips.random_transform(
                jax.random.fold_in(key, i), gt, pred)
            total = total + _lpips.lpips(
                params, self._transform(p), self._transform(g))
        loss = total / self.n_samples
        if keep_batch:
            return loss
        return jnp.mean(loss)


def parse_loss_and_weight(weight_loss_str):
    """Parse '1e+2lpips' / 'l1' / '10barron' into (name, weight)
    (reference: nlt/models/base.py:63-77): the longest prefix that parses
    as a float is the weight."""
    for i in range(len(weight_loss_str), -1, -1):
        try:
            weight = float(weight_loss_str[:i])
        except ValueError:
            continue
        return weight_loss_str[i:], weight
    return weight_loss_str, 1.0


def build_losses(loss_str, config=None, imh=None, imw=None):
    """Build the [(weight, loss)] list from a comma-separated spec like
    'barron,1e+0lpips' (reference: nlt/models/nlt.py:66-87)."""
    wloss = []
    for part in loss_str.split(","):
        name, weight = parse_loss_and_weight(part.strip())
        if name == "lpips":
            weights_npz = None
            max_res = None
            if config is not None and config.has("lpips_weights"):
                weights_npz = config.get_or_none("lpips_weights")
            if config is not None and config.has("lpips_max_res"):
                max_res = config.get_int("lpips_max_res")
            loss = LPIPS(per_ch=False, weights_npz=weights_npz,
                         max_res=max_res)
        elif name == "l1":
            loss = L1()
        elif name == "l2":
            loss = L2()
        elif name == "uvl2":
            loss = UVL2()
        elif name == "ssim":
            loss = SSIM(1.0)
        elif name == "barron":
            assert imh is not None and imw is not None, (
                "Barron loss needs image dimensions")
            # Optional config knobs beyond the reference's fixed settings:
            # trainable alpha/scale ranges and wavelet weighting
            # (reference hardcodes alpha=1, scale=0.01, base=1,
            # nlt/losses.py:91-105).
            kw = {}
            if config is not None:
                if config.has("barron_alpha"):
                    kw["alpha"] = config.get_float("barron_alpha")
                if config.has("barron_scale"):
                    kw["scale"] = config.get_float("barron_scale")
                if config.has("barron_alpha_lo"):
                    kw["alpha_lo"] = config.get_float("barron_alpha_lo")
                if config.has("barron_alpha_hi"):
                    kw["alpha_hi"] = config.get_float("barron_alpha_hi")
                if config.has("barron_scale_lo"):
                    kw["scale_lo"] = config.get_float("barron_scale_lo")
                if config.has("wavelet_scale_base"):
                    kw["wavelet_scale_base"] = config.get_float(
                        "wavelet_scale_base")
                if config.has("wavelet_num_levels"):
                    kw["wavelet_num_levels"] = config.get_int(
                        "wavelet_num_levels")
            loss = Barron(imw, imh, **kw)
        elif name == "elpips":
            # The reference names ELPIPS but ships no implementation
            # (latent NameError; reference: nlt/models/base.py:49-51,
            # SURVEY.md §2.1). Implemented for real here — see
            # losses/elpips.py.
            kw = {}
            if config is not None:
                if config.has("lpips_weights"):
                    kw["weights_npz"] = config.get_or_none("lpips_weights")
                if config.has("lpips_max_res"):
                    kw["max_res"] = config.get_int("lpips_max_res")
                if config.has("elpips_samples"):
                    kw["n_samples"] = config.get_int("elpips_samples")
            loss = ELPIPS(**kw)
        else:
            raise NotImplementedError(name)
        wloss.append((weight, loss))
    return wloss
