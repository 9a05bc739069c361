"""Device-resident cache of static per-example step inputs.

Two classes of the training step's work depend only on static
per-example data, never on params, so recomputing them every step is
pure waste:

- the ground-truth branch of feature losses (LPIPS AlexNet taps of
  gt_camspc; the LPIPS net is frozen) — models/base.extract_gt_feats;
- the warp products gt_camspc and base_camspc themselves (the fg and
  base resamples + resizes + alpha blend) — models/base.static_products.
  Caching these removes two of the step's three resamples.

This cache stores each example's extracted statics in HBM the first
time the example is seen and feeds them back into every later step
(train step variant parallel/train.make_train_step(cached_statics=True));
the loss and its gradients are identical to the uncached path because
none of the cached values carry gradients.

No reference counterpart (the reference recomputes the frozen-graph
LPIPS gt branch and all three resamples every step; nlt/losses.py:
143-169, nlt/models/nlt.py:104-137) — a TPU-side optimization enabled
by keeping the whole loss inside the jitted step.

Memory: ~24 MB per example at 512^2 float32 with barron+lpips (logged
at allocation), preallocated as one (n_slots, ...) table so inserts
are in-place donated scatters. `cap_mb` bounds the table: slots are
assigned first-come, and examples beyond capacity simply stay
uncached — the driver extracts their statics fresh each time and
feeds them directly (trainvali), so a dragon-scale dataset degrades
to partial caching instead of allocating past HBM. Multi-host: each
host caches its own example slice (per-host instance).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging as logutil

logger = logutil.Logger(loggee="parallel/feat_cache")


class GTFeatureCache:
    def __init__(self, example_ids, cap_mb=None):
        self.index = {id_: i for i, id_ in enumerate(sorted(example_ids))}
        self.n = len(self.index)
        self.cap_bytes = None if cap_mb is None else int(cap_mb) << 20
        self.n_slots = None  # decided at first insert (needs shapes)
        self.slot = {}       # id -> table row
        self.taps = None     # pytree with leading (n_slots,) dim
        self.have = None
        self._gather = jax.jit(
            lambda taps, idx: jax.tree_util.tree_map(
                lambda t: jnp.take(t, idx, axis=0), taps))
        # Donated so the update happens in place in HBM.
        self._scatter = jax.jit(
            lambda taps, idx, feats: jax.tree_util.tree_map(
                lambda t, f: t.at[idx].set(f), taps, feats),
            donate_argnums=0)
        self._subset = jax.jit(
            lambda feats, rows: jax.tree_util.tree_map(
                lambda f: jnp.take(f, rows, axis=0), feats))

    def _indices(self, ids):
        return jnp.asarray(
            np.array([self.slot[i] for i in ids], np.int32))

    def has_all(self, ids):
        return (self.taps is not None
                and all(i in self.slot and self.have[self.slot[i]]
                        for i in ids))

    def _alloc(self, ids, feats):
        leaves = jax.tree_util.tree_leaves(feats)
        per_ex = sum(f.nbytes for f in leaves) // max(len(ids), 1)
        self.n_slots = self.n
        if self.cap_bytes is not None and per_ex > 0:
            self.n_slots = min(self.n, self.cap_bytes // per_ex)
        self.taps = jax.tree_util.tree_map(
            lambda f: jnp.zeros(
                (self.n_slots,) + f.shape[1:], f.dtype), feats)
        self.have = np.zeros(self.n_slots, bool)
        total = sum(
            t.nbytes for t in jax.tree_util.tree_leaves(self.taps))
        if self.n_slots < self.n:
            logger.warn(
                "GT feature cache capped: %d of %d examples fit in "
                "%.0f MB (cache_static_mb; the rest re-extract each "
                "step)", self.n_slots, self.n, total / 1e6)
        else:
            logger.info(
                "GT feature cache: %d examples, %.0f MB HBM",
                self.n, total / 1e6)

    def insert(self, ids, feats):
        """feats: pytree of per-batch arrays (leading dim len(ids)).
        Returns True iff every id now occupies a cache slot (rows
        beyond capacity are skipped)."""
        # Compacted resample plans (take_compact_frac) carry their live
        # counts; a scene whose coverage exceeds the static capacity
        # would be SILENTLY truncated inside jit — refuse loudly here,
        # the one host-side point every extracted plan passes through.
        plan = (feats.get("products", {}).get("pred_plan", {})
                if isinstance(feats, dict) else {})
        if "clive" in plan:
            counts = np.asarray(plan["clive"])
            cap = plan["cpos"].shape[1]
            if counts.max(initial=0) > cap:
                raise ValueError(
                    "take_compact_frac capacity %d rows/example is "
                    "below this scene's live-query coverage (max %d); "
                    "raise take_compact_frac (or set 0 to disable "
                    "compaction)" % (cap, int(counts.max())))
        if self.taps is None:
            self._alloc(ids, feats)
        for i in ids:
            if i not in self.index:
                raise KeyError(i)  # unknown example id, as before
            if i not in self.slot and len(self.slot) < self.n_slots:
                self.slot[i] = len(self.slot)
        rows = [r for r, i in enumerate(ids) if i in self.slot]
        if not rows:
            return False
        slotted = [ids[r] for r in rows]
        if len(rows) < len(ids):
            feats = self._subset(
                feats, jnp.asarray(np.array(rows, np.int32)))
        self.taps = self._scatter(
            self.taps, self._indices(slotted), feats)
        for i in slotted:
            self.have[self.slot[i]] = True
        return len(rows) == len(ids)

    def gather(self, ids):
        return self._gather(self.taps, self._indices(ids))
