"""Controlled retry of the chunked resampler take at bs 8 (VERDICT r1
item 6): runs the full bs-8 512^2 training step with
NLT_TPU_TAKE_CHUNK_ROWS set, capturing the outcome either way.

Round-1 context (ops/resample.py): splitting oversized takes into
~1M-row group blocks fixed the standalone gather cliff (14.3 vs 47 ms
at 2M rows) but the full training program with chunked takes
reproducibly hard-crashed this environment's TPU worker; the knob was
gated off. This script is the per-round repro: if it crashes again,
the log IS the artifact; if the environment was fixed, it prints the
step time to compare against the unchunked bs-8 collapse (110.7 ms).

    python tools/retry_chunked_take.py [--rows 1048576] [--split 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20,
                    help="NLT_TPU_TAKE_CHUNK_ROWS value")
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    os.environ["NLT_TPU_TAKE_CHUNK_ROWS"] = str(args.rows)

    import jax

    from __graft_entry__ import (_enable_compile_cache, _make_batch,
                                 _make_model)
    from nlt_tpu.parallel import train as train_mod
    from nlt_tpu.utils.timing import slope_time

    _enable_compile_cache()
    print(f"device {jax.devices()[0].device_kind}; chunk rows "
          f"{args.rows}; bs {args.bs} @ {args.res}^2", flush=True)

    model = _make_model(args.res, args.res, 256, args.bs, loss="barron")
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    batch = _make_batch(args.bs, args.res, args.res, coverage=0.5)
    step = train_mod.make_train_step(model, tx, with_vis=False)

    t0 = time.time()
    state, loss = step(state, batch)
    print(f"compiled + first step in {time.time() - t0:.0f}s, "
          f"loss {float(loss):.4f}", flush=True)

    def run_n(n):
        nonlocal state
        for _ in range(n):
            state, loss = step(state, batch)
        return float(loss)

    dt = slope_time(run_n, n1=3, n2=9, reps=3)
    print(f"chunked bs-{args.bs} step: {dt * 1e3:.1f} ms "
          f"(unchunked round-1 reference: 110.7 ms collapsed, "
          f"bs-4 fast path ~33.9 ms)", flush=True)


if __name__ == "__main__":
    main()
