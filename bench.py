"""Benchmark: flagship training-step throughput on one chip.

Measures the fully-jitted training step (forward + Barron/LPIPS loss +
backward + AMSGrad update) of the dragon_specular-shaped model
(512x512 UV/image, depth0=16, depth=256, bs=4; reference:
nlt/config/dragon_specular.ini) on the available accelerator, and
prints ONE JSON line:

    {"metric": "texels_per_sec_per_chip", "value": ..., "unit": ...,
     "vs_baseline": ...}

vs_baseline: the reference publishes no benchmark numbers (its only
speed metric is mean per-batch wall time, never reported;
BASELINE.md). The baseline constant below is therefore an ESTIMATE of
the TF2.2-eager reference on its era hardware (single 2080Ti/V100-class
GPU, bs 4 @ 512^2): ~0.7 s/step => ~1.5e6 texels/s. The ratio is
directional, not a measured comparison.
"""

import json

import numpy as np

# Estimated TF2 reference throughput (see module docstring).
BASELINE_TEXELS_PER_SEC = 1.5e6

BS = 4
RES = 512
DEPTH = 256


def main():
    import jax

    from __graft_entry__ import (_enable_compile_cache, _make_batch,
                                 _make_model)
    from nlt_tpu.parallel import train as train_mod

    # Persistent compile cache: the remote compile service has been
    # observed to wedge; a warmed cache keeps the bench runnable.
    _enable_compile_cache()

    model = _make_model(RES, RES, DEPTH, BS)
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    train_step = train_mod.make_train_step(model, tx)

    batch = _make_batch(BS, RES, RES)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

    # Timing method: on the axon backend jax.block_until_ready returns
    # without waiting for remote execution, and a host fetch pays a
    # ~25-30 ms tunnel round trip; the honest per-step time is the
    # SLOPE between two chained-run lengths, each synchronized by
    # fetching the loss value (nlt_tpu/utils/timing.slope_time — the
    # one implementation every bench shares).
    from nlt_tpu.utils.timing import slope_time

    def measure(fn, state, extra=(), n1=10, n2=30, reps=3):
        state, loss, vis = fn(state, batch, *extra)  # compile
        float(loss)
        box = {"state": state}

        def run_n(n):
            s = box["state"]
            for _ in range(n):
                s, loss, _ = fn(s, batch, *extra)
            float(loss)
            box["state"] = s

        dt = slope_time(run_n, n1=n1, n2=n2, reps=reps)
        return dt, box["state"]

    dt_uncached, state = measure(train_step, state)

    # Steady-state step (epochs >= 1 with cache_static, the flagship
    # configs' default): the static ground truth's LPIPS features and
    # the params-independent warp products (gt/base camspc) come from
    # the HBM cache instead of being recomputed — identical
    # loss/gradients (parallel/feat_cache.py).
    step_cached = train_mod.make_train_step(
        model, tx, with_vis=True, cached_statics=True)
    extract = train_mod.make_static_extractor(model)
    statics = extract(state["params"], batch)
    dt_cached, state = measure(step_cached, state, extra=(statics,))
    dt = min(dt_cached, dt_uncached)

    texels_per_sec = BS * RES * RES / dt
    print(json.dumps({
        "metric": "texels_per_sec_per_chip",
        "value": round(texels_per_sec, 1),
        "unit": "texels/s (fwd+bwd+update, 512 UV, bs 4, depth 256, "
                "steady state)",
        "vs_baseline": round(texels_per_sec / BASELINE_TEXELS_PER_SEC, 3),
        "step_time_s": round(dt, 5),
        "step_time_uncached_gt_s": round(dt_uncached, 5),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
