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
import time

import numpy as np

# Estimated TF2 reference throughput (see module docstring).
BASELINE_TEXELS_PER_SEC = 1.5e6

BS = 4
RES = 512
DEPTH = 256


def main():
    import os

    import jax

    # Persistent compile cache: the remote compile service has been
    # observed to wedge; a warmed cache keeps the bench runnable.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("NLT_TPU_COMPILE_CACHE",
                           "/tmp/nlt_tpu_compile_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from __graft_entry__ import _make_batch, _make_model
    from nlt_tpu.parallel import train as train_mod

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
    # fetching the loss value (see tools/bench_step.py).
    def measure(fn, state, extra=(), n1=10, n2=30, reps=3):
        state, loss, vis = fn(state, batch, *extra)  # compile
        float(loss)

        def run(n, state):
            t0 = time.perf_counter()
            for _ in range(n):
                state, loss, _ = fn(state, batch, *extra)
            float(loss)
            return time.perf_counter() - t0, state

        times = []
        for _ in range(reps):
            t_1, state = run(n1, state)
            t_2, state = run(n2, state)
            times.append((t_2 - t_1) / (n2 - n1))
        times.sort()
        return times[len(times) // 2], state

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
