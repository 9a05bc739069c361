"""Time the fully-jitted training step under different loss specs.

Isolates the marginal device cost of each loss term (notably LPIPS, the
training step's compute hog at 512^2 — RESULTS.md) by timing the same
flagship model with loss variants:

    python tools/bench_step.py --res=512 --depth=256 --bs=4 \
        --losses barron "barron,1e+0lpips"

Timing method (IMPORTANT): on this container's axon backend,
`jax.block_until_ready` returns without waiting for remote execution
(a 4096^3 matmul chain "timed" at 5000 TFLOP/s that way), and any
host fetch pays a ~25-30 ms tunnel round trip. The honest per-step
time is therefore the SLOPE between two chained-run lengths, each
synchronized by fetching the final loss value:

    per_step = (T(n2) - T(n1)) / (n2 - n1)

which cancels both the round-trip constant and dispatch overheads.
Median of `--reps` repetitions (the tunnel is occasionally contended).
"""

import argparse
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
    p.add_argument("--compute_dtype", type=str, default="float32")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--losses", type=str, nargs="+",
                   default=["barron", "barron,1e+0lpips"])
    p.add_argument("--lpips_max_res", type=int, default=None)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="scan this many microbatches per update "
                        "(bs must divide; parallel/train.py)")
    p.add_argument("--cached_gt", action="store_true",
                   help="also time the cached-gt-feats step variant "
                        "(steady-state epochs >= 1 with lpips_cache_gt)")
    p.add_argument("--take_compact_frac", type=float, default=0.0,
                   help="forward-take compaction capacity fraction "
                        "(cached-statics variant only; "
                        "ops/resample.make_plan compact_rows)")
    args = p.parse_args()

    import jax

    from __graft_entry__ import (_enable_compile_cache, _make_batch,
                                 _make_model)
    from nlt_tpu.parallel import train as train_mod

    _enable_compile_cache()

    batch = _make_batch(args.bs, args.res, args.res,
                        coverage=args.coverage)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

    for loss in args.losses:
        model = _make_model(args.res, args.res, args.depth, args.bs,
                            loss=loss,
                            compute_dtype=args.compute_dtype)
        if args.take_compact_frac > 0:
            model.config.set(
                "take_compact_frac", args.take_compact_frac)
        if args.lpips_max_res is not None:
            for _, term in model.wloss:
                if hasattr(term, "max_res"):
                    term.max_res = args.lpips_max_res
        tx = train_mod.make_optimizer(1e-3)
        state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
        step = train_mod.make_train_step(
            model, tx, with_vis=False, grad_accum=args.grad_accum)

        variants = [("", step, ())]
        if args.cached_gt:
            step_cached = train_mod.make_train_step(
                model, tx, with_vis=False, cached_statics=True,
                grad_accum=args.grad_accum)
            extract = train_mod.make_static_extractor(model)
            statics = extract(state["params"], batch)
            jax.block_until_ready(statics)
            # The trainvali path's overflow guard lives in
            # feat_cache.insert; this bench bypasses the cache, so
            # check here — a truncated compact plan would time a
            # smaller, WRONG computation.
            plan = statics.get("products", {}).get("pred_plan", {})
            if "clive" in plan:
                assert (int(np.asarray(plan["clive"]).max())
                        <= plan["cpos"].shape[1]), (
                    "take_compact_frac capacity below this coverage's "
                    "live-query count; the A/B would be bogus")
            variants.append((" [cached statics]", step_cached, (statics,)))

        for tag, fn, extra in variants:
            state, l = fn(state, batch, *extra)  # compile
            float(l)

            def run(n, state):
                t0 = time.perf_counter()
                for _ in range(n):
                    state, l = fn(state, batch, *extra)
                float(l)  # host fetch: the only real synchronization
                return time.perf_counter() - t0, state

            n1, n2 = args.iters, 3 * args.iters
            times = []
            for _ in range(args.reps):
                t_1, state = run(n1, state)
                t_2, state = run(n2, state)
                times.append((t_2 - t_1) / (n2 - n1))
            print("loss=%-22s%s  median %.3f ms/step  (all: %s)"
                  % (loss, tag, 1e3 * float(np.median(times)),
                     " ".join("%.2f" % (1e3 * t) for t in times)))


if __name__ == "__main__":
    main()
