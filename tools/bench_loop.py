"""Time the WARM EPOCH LOOP SHAPE, not just the step.

RESULTS.md: warm 512^2 epochs run 0.071-0.074 s/batch while the jitted
step alone slope-times at 0.040 s — ~30 ms/batch of loop overhead. The
warm trainvali loop body executes THREE device programs per batch:

    arrays  = device_cache.shard_batch(...)   # jitted concat (hit path)
    statics = feat_cache.gather(ids)          # jitted take
    state, loss, vis = train_step_cached(state, arrays, statics)

On a tunneled PJRT client every program execution can cost extra host
wall (dispatch RPCs; remote-buffer frees), so the loop shape itself is
a performance surface. This bench slope-times (tools/bench_step.py
method: chained runs, final loss fetch, slope between two run lengths)
four loop shapes at the flagship recipe:

    step      : train_step_cached only (the 40 ms baseline)
    3prog     : assemble + gather + step (the current trainvali body)
    fused     : ONE jitted program doing concat + take + step
    2prog     : assemble + step-with-take-inside (gather fused only)

    python tools/bench_loop.py --res=512 --depth=256 --bs=4 \
        --compute_dtype=bfloat16

Reference counterpart: none (the reference's eager loop blocks on the
device every step; nlt/trainvali.py:173-186).
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--depth", type=int, default=256)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--coverage", type=float, default=1.0)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--loss", type=str, default="barron,1e+0lpips")
    p.add_argument("--n_examples", type=int, default=16,
                   help="distinct cached examples to cycle through")
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--shapes", type=str, nargs="+",
                   default=["step", "3prog", "fused"],
                   choices=["step", "3prog", "fused", "2prog"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import (_enable_compile_cache, _make_batch,
                                 _make_model)
    from nlt_tpu.parallel import train as train_mod
    from nlt_tpu.parallel.device_cache import DeviceExampleCache
    from nlt_tpu.parallel.feat_cache import GTFeatureCache

    _enable_compile_cache()

    bs, res = args.bs, args.res
    model = _make_model(res, res, args.depth, bs, loss=args.loss,
                        compute_dtype=args.compute_dtype)
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step_cached = train_mod.make_train_step(
        model, tx, with_vis=False, cached_statics=True)
    extract = train_mod.make_static_extractor(model)

    # Distinct "examples": n_examples single-example batches with
    # different seeds, cached in both caches like epoch >= 1 of a real
    # run. Batches cycle through them (shuffled order changes the
    # gather idx / row set per batch, as in training).
    n_ex = max(args.n_examples, bs)
    ids = ["ex%04d" % i for i in range(n_ex)]
    host_rows = [
        _make_batch(1, res, res, seed=i, coverage=args.coverage)
        for i in range(n_ex)]

    dcache = DeviceExampleCache()
    fcache = GTFeatureCache(ids)
    # Fill caches batch by batch (the cold-epoch path).
    for b0 in range(0, n_ex, bs):
        bids = ids[b0:b0 + bs]
        host = {k: np.concatenate(
            [host_rows[b0 + i][k] for i in range(len(bids))], 0)
            for k in host_rows[0]}
        arrays = dcache.shard_batch(None, host, bids)
        statics = extract(state["params"], arrays)
        assert fcache.insert(bids, statics)
    jax.block_until_ready(fcache.taps)
    host_proto = {k: np.concatenate(
        [host_rows[i][k] for i in range(bs)], 0) for k in host_rows[0]}

    rng = np.random.RandomState(7)
    batch_ids = [list(rng.choice(n_ex, bs, replace=False))
                 for _ in range(512)]

    keys = sorted(host_proto)

    def concat_take(rows, taps, idx):
        arrays = {k: jnp.concatenate([r[k] for r in rows], axis=0)
                  for k in keys}
        statics = jax.tree_util.tree_map(
            lambda t: jnp.take(t, idx, axis=0), taps)
        return arrays, statics

    @functools.partial(jax.jit, donate_argnums=0)
    def fused_step(state, rows, taps, idx):
        arrays, statics = concat_take(rows, taps, idx)
        return step_cached(state, arrays, statics)

    @functools.partial(jax.jit, donate_argnums=0)
    def step_take(state, arrays, taps, idx):
        statics = jax.tree_util.tree_map(
            lambda t: jnp.take(t, idx, axis=0), taps)
        return step_cached(state, arrays, statics)

    def body_step(i, state):
        bids = [ids[j] for j in batch_ids[i % len(batch_ids)]]
        arrays = dcache.shard_batch(None, host_proto, bids)
        statics = fcache.gather(bids)
        return step_cached(state, arrays, statics)

    fixed_arrays = dcache.shard_batch(None, host_proto, ids[:bs])
    fixed_statics = fcache.gather(ids[:bs])

    bodies = {
        "step": lambda i, state: step_cached(
            state, fixed_arrays, fixed_statics),
        "3prog": body_step,
        "fused": lambda i, state: fused_step(
            state,
            [dcache._rows[ids[j]][1]
             for j in batch_ids[i % len(batch_ids)]],
            fcache.taps,
            fcache._indices(
                [ids[j] for j in batch_ids[i % len(batch_ids)]])),
        "2prog": lambda i, state: step_take(
            state,
            dcache.shard_batch(
                None, host_proto,
                [ids[j] for j in batch_ids[i % len(batch_ids)]]),
            fcache.taps,
            fcache._indices(
                [ids[j] for j in batch_ids[i % len(batch_ids)]])),
    }

    for name in args.shapes:
        body = bodies[name]
        state, l = body(0, state)  # compile
        float(l)

        def run(n, state, i0):
            t0 = time.perf_counter()
            for i in range(n):
                state, l = body(i0 + i, state)
            float(l)
            return time.perf_counter() - t0, state

        n1, n2 = args.iters, 3 * args.iters
        times = []
        for r in range(args.reps):
            t_1, state = run(n1, state, 101 * r)
            t_2, state = run(n2, state, 101 * r + n1)
            times.append((t_2 - t_1) / (n2 - n1))
        print("shape=%-6s  median %.1f ms/batch  (all: %s)"
              % (name, 1e3 * float(np.median(times)),
                 " ".join("%.1f" % (1e3 * t) for t in times)))


if __name__ == "__main__":
    main()
