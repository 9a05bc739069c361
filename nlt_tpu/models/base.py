"""Abstract model API (L5 base).

Functional JAX re-design of the reference's model base
(reference: nlt/models/base.py). What changes and why:

- The reference subclasses tf.keras.Model purely for variable
  trackability and needs a `register_trainable` aliasing hack so Keras
  sees layers stored in a dict (reference: nlt/models/base.py:26-27,
  79-101). Here parameters are an explicit pytree returned by
  ``init_params`` — nothing needs registering, and ALL trainable state
  (networks + loss latents) is in one place by construction.
- ``apply(params, batch, mode)`` is a pure function of (params, batch),
  so the training step can be jitted/pjitted wholesale.

Subclass contract:
    init_params(key) -> params pytree {'net': ..., 'loss': ...}
    apply(params, batch, mode, ...) -> (pred, gt, loss_kwargs, to_vis)
    compute_loss(params, pred, gt, **loss_kwargs) -> loss
    vis_batch(...), compile_batch_vis(...)  (host-side)
"""

from .. import losses as losses_mod

ALLOWED_MODES = ("train", "vali", "test")


class Model:
    def __init__(self, config):
        self.config = config
        # List of (weight, loss_fn) pairs parsed from the config's loss
        # spec (reference: nlt/models/base.py:42-61).
        self.wloss = self._init_loss()

    def _init_loss(self):
        loss_str = self.config.get("loss")
        return losses_mod.build_losses(loss_str, config=self.config)

    @staticmethod
    def _validate_mode(mode):
        if mode not in ALLOWED_MODES:
            raise ValueError(mode)

    # ---- to be overridden ----

    def init_params(self, key):
        raise NotImplementedError

    def init_loss_params(self):
        """Latent loss state (e.g. Barron alpha/scale, LPIPS weights) as a
        per-loss dict; keys are loss indices as strings."""
        return {str(i): loss.init_params()
                for i, (_, loss) in enumerate(self.wloss)}

    def apply(self, params, batch, mode, **kwargs):
        raise NotImplementedError

    def compute_loss(self, params, pred, gt, gt_feats=None,
                     loss_key=None, **kwargs):
        """Weighted sum of the configured losses; `params` is the full
        model params pytree (loss latents live under params['loss']).

        `gt_feats`: optional {loss_index_str: cached features} for
        feature-based losses (LPIPS) whose ground-truth branch is static
        per example — see `extract_gt_feats`.
        `loss_key`: PRNG key forwarded to stochastic losses (E-LPIPS);
        the train step folds the step counter into a base key."""
        loss = 0.0
        for i, (weight, loss_fn) in enumerate(self.wloss):
            loss_params = params["loss"][str(i)]
            kw = kwargs
            if gt_feats is not None and str(i) in gt_feats:
                kw = dict(kw, gt_feats=gt_feats[str(i)])
            if loss_key is not None and getattr(
                    loss_fn, "stochastic", False):
                kw = dict(kw, key=loss_key)
            loss = loss + weight * loss_fn(loss_params, gt, pred, **kw)
        return loss

    def has_stochastic_loss(self):
        return any(getattr(l, "stochastic", False)
                   for _, l in self.wloss)

    def feat_loss_indices(self):
        """Indices of loss terms whose gt branch can be precomputed and
        cached (LPIPS with per_ch=False; not stochastic variants)."""
        return [i for i, (_, l) in enumerate(self.wloss)
                if hasattr(l, "extract_feats")
                and getattr(l, "cacheable_gt", False)
                and not getattr(l, "per_ch", False)]

    def static_products(self, batch):
        """Params-independent per-example intermediates of apply() that
        the driver may precompute once and cache in HBM (fed back via
        apply(statics=...)). Default: none."""
        return {}

    def extract_gt_feats(self, params, gt, **kwargs):
        """{loss_index_str: features} of the static ground truth, for
        reuse via compute_loss(gt_feats=...). Loss and gradients are
        bit-identical to the uncached path (the gt branch carries no
        gradient)."""
        out = {}
        for i in self.feat_loss_indices():
            _, loss_fn = self.wloss[i]
            out[str(i)] = loss_fn.extract_feats(
                params["loss"][str(i)], gt, **kwargs)
        return out

    def vis_batch(self, data_dict, outdir, mode, dump_raw_to=None):
        raise NotImplementedError

    def compile_batch_vis(self, batch_vis_dirs, outpref, mode):
        raise NotImplementedError
