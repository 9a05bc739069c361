"""A/B the multi-observation fold (models/nlt.py) at flagship shapes.

Measures the cached barron+lpips training step at n_obs=K with the K
observations folded into the obs path's batch axis (one batched conv
per stage; the round-3 default) vs the unrolled per-observation loop
(the round-2 formulation), same state/inputs, honest chained slope
timing.

Usage: python tools/bench_obs_fold.py [--k 3] [--res 512] [--bs 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--depth", type=int, default=256)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    import jax
    import numpy as np

    from __graft_entry__ import (_enable_compile_cache, _make_batch,
                                 _make_model)
    from nlt_tpu.parallel import train as train_mod
    from nlt_tpu.utils.timing import slope_time

    _enable_compile_cache()

    batch = _make_batch(args.bs, args.res, args.res)
    rng = np.random.RandomState(7)
    for f in ("nn_base", "nn_rgb", "nn_rgb_camspc"):
        base_f = batch[f]
        obs = [base_f] + [
            np.clip(base_f * rng.uniform(0.6, 1.4), 0, 1)
            .astype(np.float32) for _ in range(args.k - 1)]
        batch[f] = np.stack(obs, axis=1)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

    def measure(fold):
        model = _make_model(args.res, args.res, args.depth, args.bs,
                            compute_dtype=args.dtype)
        model.obs_fold = fold
        tx = train_mod.make_optimizer(1e-3)
        state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
        step = train_mod.make_train_step(
            model, tx, with_vis=True, cached_statics=True)
        extract = train_mod.make_static_extractor(model)
        statics = extract(state["params"], batch)
        state, loss, _ = step(state, batch, statics)
        first_loss = float(loss)
        box = {"state": state}

        def run_n(n):
            s = box["state"]
            for _ in range(n):
                s, loss, _ = step(s, batch, statics)
            float(loss)
            box["state"] = s

        dt = slope_time(run_n, n1=10, n2=30, reps=3)
        return dt, first_loss

    dt_fold, loss_fold = measure(True)
    dt_unr, loss_unr = measure(False)
    print("n_obs=%d %s @ %d^2: folded %.2f ms/step, unrolled %.2f "
          "ms/step (%.1f%% faster); first-step losses %.5f / %.5f"
          % (args.k, args.dtype, args.res, dt_fold * 1e3, dt_unr * 1e3,
             100 * (dt_unr - dt_fold) / dt_unr, loss_fold, loss_unr))


if __name__ == "__main__":
    main()
