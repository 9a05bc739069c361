import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp
from __graft_entry__ import _make_batch, _make_model
from nlt_tpu.parallel import train as train_mod

for dtype in ['float32', 'bfloat16']:
    model = _make_model(512, 512, 256, 4)
    model.config.set('compute_dtype', dtype)
    model.compute_dtype = jnp.dtype(dtype)
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step = train_mod.make_train_step(model, tx)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in _make_batch(4, 512, 512).items()}
    t0 = time.perf_counter()
    state, loss, vis = step(state, batch); jax.block_until_ready((loss, vis))
    print('%s compile: %.1f s' % (dtype, time.perf_counter()-t0), flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        state, loss, vis = step(state, batch)
    jax.block_until_ready((loss, vis))
    dt = (time.perf_counter()-t0)/20
    print('%s: %.4f s/step  %.0f Mtexels/s  loss=%.4f' % (dtype, dt, 4*512*512/dt/1e6, float(loss)), flush=True)
