"""Checkpoint/resume via Orbax.

Replaces tf.train.Checkpoint + CheckpointManager (reference:
nlt/trainvali.py:130-141, nlt/util/io.py:32-37). The WHOLE training
state pytree — params (networks AND loss latents), optimizer state, and
step — is saved, fixing the reference quirk where the Barron loss's
trainable variables were never checkpointed (SURVEY.md §5). Retention
follows keep_recent_epochs (<= 0 keeps everything).
"""

import jax
import numpy as np
import orbax.checkpoint as ocp

from . import logging as logutil

logger = logutil.Logger(loggee="utils/checkpoint")


class CheckpointManager:
    def __init__(self, ckptdir, max_to_keep=None, keep_best_metric=None):
        """keep_best_metric (e.g. 'psnr_vali'): retention keeps the
        most recent max_to_keep steps PLUS the step with the best
        logged validation metric — the documented `--step=best`
        workflow must survive retention on long runs whose quality
        drifts past the best epoch (RESULTS.md: ~0.4 dB late-run
        overfit on small scenes). Orbax's own best_fn wants the metric
        at save() time, but psnr_vali for step N is only computed by
        the validation pass AFTER the step-N save, so retention is
        done here: orbax keeps everything and prune() (called by the
        driver once the epoch's scalars are on disk) deletes what
        neither window protects. Reference counterpart (recency-only):
        CheckpointManager(max_to_keep), nlt/trainvali.py:134-141."""
        if max_to_keep is not None and max_to_keep <= 0:
            max_to_keep = None  # keep all
        self._dir = ckptdir
        self._max_to_keep = max_to_keep
        self._keep_best_metric = (
            keep_best_metric if max_to_keep is not None else None)
        self._mgr = ocp.CheckpointManager(
            ckptdir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=(None if self._keep_best_metric
                             else max_to_keep)))

    def prune(self):
        """Apply keep-best retention (no-op without keep_best_metric).
        Call after the epoch's vali scalars are written, so a
        just-saved step's metric counts. All processes call it (like
        save); Orbax's delete handles multi-host coordination."""
        if self._keep_best_metric is None or self._max_to_keep is None:
            return
        steps = sorted(int(s) for s in self._mgr.all_steps())
        if (jax.process_count() == 1
                and len(steps) <= self._max_to_keep):
            return  # nothing deletable (multi-process still broadcasts
            # below — an early-out there could diverge across hosts on
            # a transiently stale step listing and hang the collective)
        keep = set(steps[-self._max_to_keep:])
        picked = best_step(self._dir, steps,
                           metric=self._keep_best_metric)
        if picked is not None:
            keep.add(int(picked[0]))
        kill = [s for s in steps if s not in keep]
        if jax.process_count() > 1:
            # delete() runs a multihost barrier per call, so every
            # process must issue the SAME deletions. Host 0 owns the
            # scalars log (other hosts may see it stale/absent):
            # broadcast its kill list (fixed-size padded — broadcast
            # needs one shape everywhere; >cap stragglers go next
            # epoch).
            from jax.experimental import multihost_utils
            cap = 64
            arr = np.full((cap,), -1, np.int64)
            arr[:min(len(kill), cap)] = kill[:cap]
            arr = multihost_utils.broadcast_one_to_all(arr)
            kill = [int(s) for s in arr if s >= 0]
        for s in kill:
            try:
                self._mgr.delete(s)
            except Exception as e:
                logger.warn("Retention could not delete step %d: "
                            "%s", s, e)

    def save(self, step, state, force=False):
        """force=True overwrites an existing step (the preemption save
        lands on the last completed epoch, which may already have a
        periodic checkpoint)."""
        self._mgr.save(int(step), args=ocp.args.StandardSave(state),
                       force=force)
        return self._mgr.directory / str(int(step))

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def restore(self, state_like, step=None):
        """Restore into the structure of `state_like`; returns
        (state, restored_step) — (state_like, 0) if nothing to restore
        (reference behavior: nlt/util/io.py:32-37 'Started from
        scratch')."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            logger.info("Started from scratch")
            return state_like, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))
        # Orbax restores numpy arrays; push back onto the devices/
        # shardings of the template state.
        restored = jax.tree.map(
            lambda tpl, val: jax.device_put(
                val, tpl.sharding) if hasattr(tpl, "sharding")
            else np.asarray(val),
            state_like, restored)
        logger.info("Resumed from step %d", step)
        return restored, int(step)

    def close(self):
        self._mgr.close()


def _vali_scalars_path(ckpt_dir, metric_split="vali"):
    """<outdir>/checkpoints -> <outdir>/summary_vali/scalars.jsonl.
    abspath first: a relative --ckpt with no separator ('checkpoints'
    from inside the outdir) must resolve to its parent, not itself."""
    import os

    outdir = os.path.dirname(
        os.path.abspath(str(ckpt_dir).rstrip("/")))
    return os.path.join(
        outdir, "summary_%s" % metric_split, "scalars.jsonl")


def best_step(ckpt_dir, available, metric="psnr_vali"):
    """The available checkpoint step with the best logged validation
    metric (trainvali's JSONL scalars under <outdir>/summary_vali/).
    Returns (step, value), or None when no series exists. Retention
    (keep_recent_epochs) may have evicted the global best — selection
    is over checkpoints that still exist, with a warning when a better
    evicted epoch is on record. The reference has no checkpoint
    selection at all (nlt_test restores whatever --ckpt names;
    nlt/nlt_test.py:61-75)."""
    import json
    import os

    path = _vali_scalars_path(ckpt_dir)
    if not os.path.isfile(path):
        return None
    series = {}
    with open(path) as h:
        for line in h:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if r.get("tag") == metric and "value" in r:
                series[int(r["step"])] = float(r["value"])  # last wins
    if not series:
        return None
    finite = {s: v for s, v in series.items() if np.isfinite(v)}
    if not finite:
        return None
    avail = {int(s) for s in (available or [])}
    reachable = {s: v for s, v in finite.items() if s in avail}
    if not reachable:
        return None
    step, value = max(reachable.items(), key=lambda kv: kv[1])
    global_step, global_value = max(
        finite.items(), key=lambda kv: kv[1])
    if global_step not in avail and global_value > value:
        logger.warn(
            "Best %s epoch %d (%.3f) was evicted by retention; using "
            "best REMAINING checkpoint %d (%.3f). Raise "
            "keep_recent_epochs to keep more.", metric, global_step,
            global_value, step, value)
    return step, value


def resolve_step(ckpt_dir, step, metric="psnr_vali"):
    """CLI step spec -> concrete step: None/'latest' stays None
    (latest), 'best' selects by the logged vali metric (falling back
    to latest with a warning when nothing is selectable), numeric
    strings become ints. Multi-process: every process resolves, then
    host 0's answer is broadcast — per-host divergence (e.g. a scalar
    log visible only where host 0 wrote it) would silently mix
    checkpoints across the sharded computation."""
    import os

    if step is None:
        return None
    if isinstance(step, str) and step.lower() == "latest":
        return None
    if isinstance(step, str) and step.lower() == "best":
        mgr = CheckpointManager(ckpt_dir)
        try:
            picked = best_step(ckpt_dir, mgr.all_steps(), metric=metric)
        finally:
            mgr.close()
        if picked is None:
            if not os.path.isfile(_vali_scalars_path(ckpt_dir)):
                logger.warn(
                    "--step=best: no vali scalar log at %s; using "
                    "latest", _vali_scalars_path(ckpt_dir))
            else:
                logger.warn(
                    "--step=best: a vali scalar log exists but no "
                    "logged epoch matches a retained checkpoint under "
                    "%s (pointing at a different run's checkpoints? "
                    "every scored epoch evicted?); using latest",
                    ckpt_dir)
        else:
            logger.info("--step=best resolved to step %d (%s %.3f)",
                        picked[0], metric, picked[1])
        resolved = None if picked is None else picked[0]
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            agreed = int(multihost_utils.broadcast_one_to_all(
                np.asarray(-1 if resolved is None else resolved,
                           np.int32)))
            if ((agreed if agreed >= 0 else None) != resolved):
                logger.warn(
                    "--step=best: host 0 resolved step %s; this "
                    "process had %s — using host 0's", agreed,
                    resolved)
            resolved = None if agreed < 0 else agreed
        return resolved
    try:
        return int(step)
    except (TypeError, ValueError):
        raise ValueError(
            "--step must be an integer, 'best', or 'latest'; got %r"
            % (step,))
