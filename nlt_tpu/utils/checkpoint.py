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
    def __init__(self, ckptdir, max_to_keep=None):
        if max_to_keep is not None and max_to_keep <= 0:
            max_to_keep = None  # keep all
        self._mgr = ocp.CheckpointManager(
            ckptdir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

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
