"""Layout experiment on the s2-conv einsum relayout tax (VERDICT r2 #7).

The cached-barron flagship step's profile shows ~8 ms/step of layout
copies around the k==s==2 space-to-depth einsums (RESULTS.md). Two
in-XLA reformulations were measured-and-rejected in round 2 (row-parity
matmuls 37.6 ms, tap-split a wash); this bench A/Bs the remaining
lever: letting XLA pick the jit-BOUNDARY layouts of the train step's
operands (jax.experimental.layout AUTO) instead of the default
row-major convention, so layout assignment can propagate its preferred
activation layouts outward instead of transposing at the boundary.

Variants, all measured in one process on the same state/batch with
honest chained slope timing:
  base  — the production cached step (jit defaults);
  auto  — jit(in_shardings=Format(Layout.AUTO),
              out_shardings=Format(Layout.AUTO)); inputs are laid out
          by a device_put into the compiled executable's chosen input
          formats first, so the measured loop pays no boundary copies.

Usage: python tools/bench_layout.py [--coverage 0.5] [--loss barron]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coverage", type=float, default=0.5)
    p.add_argument("--loss", type=str, default="barron")
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--depth", type=int, default=256)
    args = p.parse_args()

    import jax
    import numpy as np
    from jax.experimental.layout import Format, Layout

    from __graft_entry__ import (_enable_compile_cache, _make_batch,
                                 _make_model)
    from nlt_tpu.parallel import train as train_mod
    from nlt_tpu.utils.timing import slope_time

    _enable_compile_cache()

    model = _make_model(args.res, args.res, args.depth, args.bs,
                        loss=args.loss, compute_dtype=args.dtype)
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    batch = _make_batch(args.bs, args.res, args.res,
                        coverage=args.coverage)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

    extract = train_mod.make_static_extractor(model)
    statics = extract(state["params"], batch)

    def measure(step, state, batch_, statics_, n1=10, n2=30, reps=3):
        state, loss, _ = step(state, batch_, statics_)
        float(loss)
        box = {"state": state}

        def run_n(n):
            s = box["state"]
            for _ in range(n):
                s, loss, _ = step(s, batch_, statics_)
            float(loss)
            box["state"] = s

        dt = slope_time(run_n, n1=n1, n2=n2, reps=reps)
        return dt, box["state"]

    # Base: the production cached step.
    step_base = train_mod.make_train_step(
        model, tx, with_vis=True, cached_statics=True)
    dt_base, state = measure(step_base, state, batch, statics)
    print("base: %.2f ms/step" % (dt_base * 1e3))

    # AUTO boundary layouts: recompile the same python step with XLA
    # choosing every input/output layout, then lay the operands out in
    # those formats before timing. make_train_step returns a
    # jax.jit-wrapped function; rebuild from its wrapped callable.
    step_fn = train_mod.make_train_step(
        model, tx, with_vis=True, cached_statics=True)
    auto = Format(Layout.AUTO)
    inner = getattr(step_fn, "__wrapped__", None)
    if inner is None:
        print("auto: SKIPPED (jitted step exposes no __wrapped__; "
              "jax %s)" % jax.__version__)
        return
    step_auto = jax.jit(inner, in_shardings=auto, out_shardings=auto)
    lowered = step_auto.lower(state, batch, statics)
    compiled = lowered.compile()
    in_fmts = compiled.input_formats
    # Lay out state/batch/statics in the executable's chosen formats
    # and call the COMPILED executable (the jit wrapper rejects
    # concrete arrays under AUTO).
    flat_args, treedef = jax.tree.flatten((state, batch, statics))
    flat_fmts, _ = jax.tree.flatten(in_fmts)
    placed = [jax.device_put(a, f)
              for a, f in zip(flat_args, flat_fmts)]
    state_a, batch_a, statics_a = jax.tree.unflatten(treedef, placed)
    dt_auto, _ = measure(compiled, state_a, batch_a, statics_a)
    print("auto: %.2f ms/step  (vs base %.2f; delta %+.2f ms)"
          % (dt_auto * 1e3, dt_base * 1e3, (dt_auto - dt_base) * 1e3))


if __name__ == "__main__":
    main()
