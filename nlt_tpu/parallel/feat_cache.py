"""Device-resident cache of static ground-truth loss features.

LPIPS is the training step's single largest compute block (RESULTS.md:
~0.74 ms of a 2.16 ms step at 512^2), and half of it — the AlexNet
branch over the ground truth — recomputes the same values every epoch:
gt_camspc depends only on static per-example data (models/nlt.gt_camspc),
and the LPIPS network itself is frozen. This cache stores each example's
normalized gt taps in HBM the first time the example is seen and feeds
them back into every later step (train step variant
parallel/train.make_train_step(cached_gt_feats=True)); the loss and its
gradients are bit-identical to the uncached path because the gt branch
carries no gradient.

No reference counterpart (the reference recomputes the frozen-graph
LPIPS gt branch every step; nlt/losses.py:143-169) — this is a TPU-side
optimization enabled by keeping the whole loss inside the jitted step.

Memory: ~10.6 MB per example at 512^2 float32 (logged at allocation).
Scope: single-process, data-parallel-only (the driver disables it under
multi-host or texel-tile sharding).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging as logutil

logger = logutil.Logger(loggee="parallel/feat_cache")


class GTFeatureCache:
    def __init__(self, example_ids):
        self.index = {id_: i for i, id_ in enumerate(sorted(example_ids))}
        self.n = len(self.index)
        self.taps = None  # pytree with leading (n_examples,) dim
        self.have = np.zeros(self.n, bool)
        self._gather = jax.jit(
            lambda taps, idx: jax.tree_util.tree_map(
                lambda t: jnp.take(t, idx, axis=0), taps))
        # Donated so the update happens in place in HBM.
        self._scatter = jax.jit(
            lambda taps, idx, feats: jax.tree_util.tree_map(
                lambda t, f: t.at[idx].set(f), taps, feats),
            donate_argnums=0)

    def _indices(self, ids):
        return jnp.asarray(
            np.array([self.index[i] for i in ids], np.int32))

    def has_all(self, ids):
        return (self.taps is not None
                and all(self.have[self.index[i]] for i in ids))

    def insert(self, ids, feats):
        """feats: pytree of per-batch arrays (leading dim len(ids))."""
        if self.taps is None:
            self.taps = jax.tree_util.tree_map(
                lambda f: jnp.zeros((self.n,) + f.shape[1:], f.dtype),
                feats)
            total = sum(t.nbytes for t in jax.tree_util.tree_leaves(
                self.taps))
            logger.info(
                "GT feature cache: %d examples, %.0f MB HBM",
                self.n, total / 1e6)
        self.taps = self._scatter(self.taps, self._indices(ids), feats)
        for i in ids:
            self.have[self.index[i]] = True

    def gather(self, ids):
        return self._gather(self.taps, self._indices(ids))
