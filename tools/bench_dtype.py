"""Compare f32 vs bf16 compute_dtype on the flagship training step.

Uses chained-run slope timing (nlt_tpu/utils/timing.py) — the only
honest method on this stack; earlier block_until_ready-based numbers
measured dispatch, not device time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _enable_compile_cache, _make_batch, _make_model
from nlt_tpu.parallel import train as train_mod
from nlt_tpu.utils.timing import slope_time

_enable_compile_cache()

for dtype in ["float32", "bfloat16"]:
    model = _make_model(512, 512, 256, 4)
    model.config.set("compute_dtype", dtype)
    model.compute_dtype = jnp.dtype(dtype)
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step = train_mod.make_train_step(model, tx, with_vis=False)
    batch = {k: jax.device_put(np.asarray(v))
             for k, v in _make_batch(4, 512, 512).items()}

    t0 = time.perf_counter()
    state, loss = step(state, batch)
    final_loss = float(loss)
    print("%s compile+first: %.1f s" % (dtype, time.perf_counter() - t0),
          flush=True)

    box = {"state": state}

    def run(n):
        s = box["state"]
        for _ in range(n):
            s, loss = step(s, batch)
        float(loss)
        box["state"] = s

    dt = slope_time(run, n1=5, n2=15, reps=3)
    print("%s: %.4f s/step  %.1f Mtexels/s  loss=%.4f"
          % (dtype, dt, 4 * 512 * 512 / dt / 1e6, final_loss), flush=True)
