"""Capture and parse a device profile of the flagship training step.

Runs a few steps under jax.profiler, then parses the Chrome-trace
export directly (no tensorboard needed) and prints per-op and
per-category device time, each with its source attribution. The
device_duration_ps fields in the trace agree with honest slope timing
(utils/timing.py) to <1% on this stack, unlike block_until_ready-based
wall clocks.

    python tools/profile_step.py --res=512 --depth=256 --bs=4 \
        --loss=barron --steps=5 [--keep]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_trace(tracedir, steps):
    paths = glob.glob(os.path.join(
        tracedir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError("no trace under %s" % tracedir)
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"]["name"]
            if e.get("name") == "thread_name":
                tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    dev = [p for p, n in pnames.items() if "TPU" in n]
    if not dev:
        raise RuntimeError("no TPU process in trace (processes: %s)"
                           % pnames)
    dev = dev[0]
    by = collections.Counter()
    cat = collections.Counter()
    src = {}
    tot = 0.0
    for e in ev:
        if (e.get("ph") == "X" and e["pid"] == dev
                and tnames.get((e["pid"], e["tid"])) == "XLA Ops"):
            a = e.get("args", {})
            d = float(a.get("device_duration_ps", 0)) / 1e6  # -> us
            by[e["name"]] += d
            cat[a.get("hlo_category", "?")] += d
            tot += d
            if e["name"] not in src:
                src[e["name"]] = a.get("source", "") or \
                    a.get("long_name", "")[:80]
    print("total device: %.1f ms/step (%d steps)" % (tot / steps / 1e3,
                                                     steps))
    print("\nby HLO category:")
    for k, v in cat.most_common(12):
        print("  %-26s %7.2f ms/step (%4.1f%%)"
              % (k, v / steps / 1e3, 100 * v / tot))
    print("\ntop ops:")
    for k, v in by.most_common(20):
        print("  %-24s %7.2f ms/step (%4.1f%%)  %s"
              % (k, v / steps / 1e3, 100 * v / tot,
                 src.get(k, "")[-60:]))
    by_src = collections.Counter()
    for k, v in by.items():
        by_src[src.get(k, "?")] += v
    print("\nby source line (all ops):")
    for k, v in by_src.most_common(24):
        print("  %7.2f ms/step (%4.1f%%)  %s"
              % (v / steps / 1e3, 100 * v / tot, k[-70:]))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--depth", type=int, default=256)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--coverage", type=float, default=1.0)
    p.add_argument("--loss", type=str, default="barron,1e+0lpips")
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--tracedir", type=str, default="/tmp/nlt_tpu_profile")
    p.add_argument("--keep", action="store_true",
                   help="keep the trace dir for the TB profile viewer")
    p.add_argument("--cached", action="store_true",
                   help="profile the cached-statics step variant")
    args = p.parse_args()

    import jax

    from __graft_entry__ import (_enable_compile_cache, _make_batch,
                                 _make_model)
    from nlt_tpu.parallel import train as train_mod

    _enable_compile_cache()
    model = _make_model(args.res, args.res, args.depth, args.bs,
                        loss=args.loss, compute_dtype=args.dtype)
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step = train_mod.make_train_step(model, tx, with_vis=False,
                                     cached_statics=args.cached)
    batch = {k: jax.device_put(np.asarray(v))
             for k, v in _make_batch(args.bs, args.res, args.res,
                          coverage=args.coverage).items()}
    if args.cached:
        extract = train_mod.make_static_extractor(model)
        statics = extract(state["params"], batch)
        run = lambda state: step(state, batch, statics)
    else:
        run = lambda state: step(state, batch)
    state, loss = run(state)
    float(loss)  # compile + sync (block_until_ready would not)

    shutil.rmtree(args.tracedir, ignore_errors=True)
    jax.profiler.start_trace(args.tracedir)
    for _ in range(args.steps):
        state, loss = run(state)
    float(loss)
    jax.profiler.stop_trace()

    parse_trace(args.tracedir, args.steps)
    if not args.keep:
        shutil.rmtree(args.tracedir, ignore_errors=True)


if __name__ == "__main__":
    main()
