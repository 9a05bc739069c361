"""Benchmark: flagship training-step throughput on one chip.

Measures the fully-jitted training step (forward + Barron/LPIPS loss +
backward + AMSGrad update) of the dragon_specular-shaped model
(512x512 UV/image, depth0=16, depth=256, bs=4; reference:
nlt/config/dragon_specular.ini) on the available accelerator, and
prints ONE JSON line:

    {"metric": "texels_per_sec_per_chip", "value": ..., "unit": ...,
     "vs_baseline": ...}

Headline: compute_dtype=bfloat16 (the shipped-config default since
round 3; quality-equal at 512^2, RESULTS.md); the float32 cached step
is reported alongside (reference-parity numerics stay one knob away).

vs_baseline: the reference publishes no benchmark numbers (its only
speed metric is mean per-batch wall time, never reported;
BASELINE.md). The baseline constant below is therefore an ESTIMATE of
the TF2.2-eager reference on its era hardware (single 2080Ti/V100-class
GPU, bs 4 @ 512^2): ~0.7 s/step => ~1.5e6 texels/s. The ratio is
directional, not a measured comparison.

Roofline fields (VERDICT r2 #3 — numbers behind "the floor"):
- flops_per_step: XLA HLO cost analysis of the jitted cached step
  (forward+backward+update, resample gathers count 0 FLOPs);
- mfu_pct: flops_per_step / step_time / v5e bf16 peak (394 TFLOP/s,
  public spec; f32 compute runs inherently below this MXU peak);
- take_*: the flagship-shape flat row take (the resampler forward's
  hot op) slope-timed STANDALONE: ns/row (vs the ~6.5 ns/row measured
  floor, ops/resample.py) and useful-bytes GB/s vs the 819 GB/s v5e
  HBM peak. Useful bytes/row = 48 read (4C f32 window row) + 4 idx +
  48 write; random row access pays transaction granularity, so the
  HBM percentage is the honest utilization of *useful* traffic;
- resample_bwd_*: the planned resample's backward (Pallas VMEM-table
  scatter + window-shift adjoints), measured as grad-minus-forward of
  the standalone planned resample. Useful bytes/row = 12 grad read +
  routing reads (16) + 48 read-modify-write of the table accumulator.
"""

import json

import numpy as np

# Estimated TF2 reference throughput (see module docstring).
BASELINE_TEXELS_PER_SEC = 1.5e6

BS = 4
RES = 512
DEPTH = 256

# TPU v5e public per-chip peaks.
V5E_PEAK_BF16_FLOPS = 394e12
V5E_HBM_BYTES_PER_S = 819e9

# Useful bytes per resample row (see module docstring).
TAKE_BYTES_PER_ROW = 48 + 4 + 48
SCATTER_BYTES_PER_ROW = 12 + 16 + 2 * 48


def _cost_of(jitted, *args):
    """XLA cost analysis of one call: {'flops', 'bytes'} or None.

    The compiled-executable analysis is used (the lowered-only one
    returns None on this backend); the executable is already in the
    jit cache when this runs, so no extra compile happens."""
    try:
        # lower().compile() builds a separate AOT executable — run this
        # only AFTER the jitted step has executed, so the persistent
        # compile cache (same HLO) makes it a fast cache hit instead of
        # a second 35-60 s flagship compile.
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        b = float(cost.get("bytes accessed", 0.0))
        o = float(cost.get("optimal_seconds", 0.0))
        return ({"flops": f, "bytes": b, "optimal_s": o}
                if f > 0 else None)
    except Exception:
        return None


def _bench_resample(batch, slope_time):
    """Standalone flagship-shape planned-resample forward and backward
    (grad minus forward), slope-timed with chained value dependence."""
    import jax
    import jax.numpy as jnp

    from nlt_tpu.ops import resample as resample_mod

    warp = jnp.asarray(batch["warp"]) * jnp.float32(RES)
    img = jnp.asarray(batch["base"])
    plan = resample_mod.make_plan(warp, RES, RES)
    rows = BS * RES * RES

    @jax.jit
    def fwd(im, s):
        out = resample_mod.resample_planned(im + 0.0 * s, plan)
        return jnp.sum(out[:, :1, :1])

    @jax.jit
    def fwdbwd(im, s):
        g = jax.grad(
            lambda t: jnp.sum(resample_mod.resample_planned(t, plan))
        )(im + 0.0 * s)
        return jnp.sum(g[:, :1, :1])

    def run_n_of(fn):
        def run_n(n):
            s = jnp.float32(0.0)
            for _ in range(n):
                s = fn(img, s)
            float(s)
        return run_n

    float(fwd(img, jnp.float32(0.0)))       # compile
    float(fwdbwd(img, jnp.float32(0.0)))
    t_fwd = slope_time(run_n_of(fwd), n1=5, n2=20, reps=3)
    t_fb = slope_time(run_n_of(fwdbwd), n1=5, n2=20, reps=3)
    t_bwd = max(t_fb - t_fwd, 0.0)
    out = {
        "take_ns_per_row": round(t_fwd / rows * 1e9, 3),
        "take_gbps_useful": round(
            rows * TAKE_BYTES_PER_ROW / t_fwd / 1e9, 1),
        "resample_bwd_ms": round(t_bwd * 1e3, 3),
    }
    out["take_pct_hbm"] = round(
        100 * rows * TAKE_BYTES_PER_ROW / t_fwd / V5E_HBM_BYTES_PER_S, 1)
    if t_bwd > 0:
        out["scatter_gbps_useful"] = round(
            rows * SCATTER_BYTES_PER_ROW / t_bwd / 1e9, 1)
        out["scatter_pct_hbm"] = round(
            100 * rows * SCATTER_BYTES_PER_ROW / t_bwd
            / V5E_HBM_BYTES_PER_S, 1)
    return out


def _bench_warm_loop(model, tx, batch_shape_args, n_examples=16,
                     n_batches_sched=256, seed=7):
    """Warm-epoch loop proxy: the trainvali steady-state body is THREE
    device programs per batch (device-cache assemble + static-feature
    gather + cached train step; tools/bench_loop.py measured the shape
    floor at +2.3 ms over the bare step). Slope-timed over shuffled
    example ids like a real epoch. Returns s/batch."""
    import jax
    import time as _time

    from __graft_entry__ import _make_batch
    from nlt_tpu.parallel import train as train_mod
    from nlt_tpu.parallel.device_cache import DeviceExampleCache
    from nlt_tpu.parallel.feat_cache import GTFeatureCache

    bs, res = batch_shape_args
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step_cached = train_mod.make_train_step(
        model, tx, with_vis=False, cached_statics=True)
    extract = train_mod.make_static_extractor(model)

    ids = ["ex%04d" % i for i in range(n_examples)]
    rows = [_make_batch(1, res, res, seed=i) for i in range(n_examples)]
    dcache = DeviceExampleCache()
    fcache = GTFeatureCache(ids)
    for b0 in range(0, n_examples, bs):
        bids = ids[b0:b0 + bs]
        host = {k: np.concatenate(
            [rows[b0 + i][k] for i in range(len(bids))], 0)
            for k in rows[0]}
        arrays = dcache.shard_batch(None, host, bids)
        statics = extract(state["params"], arrays)
        assert fcache.insert(bids, statics)
    host_proto = {k: np.concatenate(
        [rows[i][k] for i in range(bs)], 0) for k in rows[0]}
    rng = np.random.RandomState(seed)
    sched = [[ids[j] for j in rng.choice(n_examples, bs, replace=False)]
             for _ in range(n_batches_sched)]

    def body(i, state):
        bids = sched[i % len(sched)]
        arrays = dcache.shard_batch(None, host_proto, bids)
        statics = fcache.gather(bids)
        return step_cached(state, arrays, statics)

    state, loss = body(0, state)  # compile
    float(loss)

    def run(n, state, i0):
        t0 = _time.perf_counter()
        for i in range(n):
            state, loss = body(i0 + i, state)
        float(loss)
        return _time.perf_counter() - t0, state

    n1, n2, times = 8, 24, []
    for r in range(3):
        t1, state = run(n1, state, 97 * r)
        t2, state = run(n2, state, 97 * r + n1)
        times.append((t2 - t1) / (n2 - n1))
    return float(np.median(times))


def _bench_serving(res=512, depth=256):
    """Cached serving latency at bs 1, uint8-packed responses (the
    RESULTS.md serving headline shape): a Server over a fresh-init
    state (compute is params-independent), zero obs pyramid (same
    program shape as a baked pyramid), repeat-query path through the
    device input cache."""
    from __graft_entry__ import _make_batch
    from nlt_tpu import serve as serve_mod
    from nlt_tpu.utils.config import Config

    cfg = Config({
        "dataset": "nlt", "model": "nlt", "loss": "barron,1e+0lpips",
        "imh": res, "imw": res, "uvh": res, "uvw": res,
        "use_obs": True, "skip_connect_base": True,
        "linear_space": False,
        "depth0": 16, "depth": depth, "kernel": 2, "stride": 2,
        "norm": "None", "act": "leakyrelu", "pool": "None",
        "bs": 1, "compute_dtype": "bfloat16",
        "lr": "1e-3", "data_root": "/nonexistent_bench_data",
        "holdout_cam": "C00", "holdout_light": "L000",
    })
    server = serve_mod.Server(
        "/tmp/nlt_bench_serve_ckpt", config=cfg, pack="uint8")
    server.precompute_obs(dataset=None)  # no data: zero obs features
    req = _make_batch(1, res, res, seed=3)
    stats = server.benchmark(req, n=20, ids=["bench_req0"])
    return {
        "serving_cached_ms_per_request": round(
            stats["latency_s"] * 1e3, 2),
        "serving_cached_fps": round(stats["fps"], 1),
    }


def main():
    import jax

    from __graft_entry__ import (_enable_compile_cache, _make_batch,
                                 _make_model)
    from nlt_tpu.parallel import train as train_mod

    # Persistent compile cache: the remote compile service has been
    # observed to wedge; a warmed cache keeps the bench runnable.
    _enable_compile_cache()

    # Timing method: on the axon backend jax.block_until_ready returns
    # without waiting for remote execution, and a host fetch pays a
    # ~25-30 ms tunnel round trip; the honest per-step time is the
    # SLOPE between two chained-run lengths, each synchronized by
    # fetching the loss value (nlt_tpu/utils/timing.slope_time — the
    # one implementation every bench shares).
    from nlt_tpu.utils.timing import slope_time

    batch = _make_batch(BS, RES, RES)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

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

    tx = train_mod.make_optimizer(1e-3)

    def measure_dtype(dtype, want_cost=False):
        """Uncached + cached (steady-state, the flagship configs'
        default: statics' LPIPS features and warp products from HBM —
        identical loss/gradients, parallel/feat_cache.py) step times."""
        model = _make_model(RES, RES, DEPTH, BS, compute_dtype=dtype)
        state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
        train_step = train_mod.make_train_step(model, tx)
        step_cached = train_mod.make_train_step(
            model, tx, with_vis=True, cached_statics=True)
        extract = train_mod.make_static_extractor(model)
        statics = extract(state["params"], batch)
        dt_unc, state = measure(train_step, state)
        dt_cached, state = measure(step_cached, state, extra=(statics,))
        # Cost analysis after the measured executions: the persistent
        # compile cache then serves the AOT compile (see _cost_of).
        cost = (_cost_of(step_cached, state, batch, statics)
                if want_cost else None)
        return dt_unc, dt_cached, cost, model

    # Headline: bf16 compute (the shipped default); f32 for parity.
    dt_unc16, dt_c16, cost16, _model = measure_dtype(
        "bfloat16", want_cost=True)
    _, dt_c32, _, _ = measure_dtype("float32")

    dt = min(dt_c16, dt_unc16)
    texels_per_sec = BS * RES * RES / dt
    rec = {
        "metric": "texels_per_sec_per_chip",
        "value": round(texels_per_sec, 1),
        "unit": "texels/s (fwd+bwd+update, 512 UV, bs 4, depth 256, "
                "bf16 compute, steady state)",
        "vs_baseline": round(texels_per_sec / BASELINE_TEXELS_PER_SEC, 3),
        # The TF2 reference was never runnable here (no TF in the
        # image; BASELINE.md): the denominator is the documented
        # ESTIMATE of the reference's era-GPU throughput, so the
        # multiplier is directional, not a measured comparison.
        "vs_baseline_estimated": True,
        "step_time_s": round(dt, 5),
        "step_time_uncached_gt_s": round(dt_unc16, 5),
        "step_time_f32_s": round(dt_c32, 5),
        "device": str(jax.devices()[0]),
    }
    if cost16:
        rec["flops_per_step"] = round(cost16["flops"])
        rec["mfu_pct"] = round(
            100 * cost16["flops"] / dt / V5E_PEAK_BF16_FLOPS, 2)
        if cost16["bytes"]:
            # XLA's per-instruction operand-byte count. NOT actual HBM
            # traffic (pre-fusion operands re-read from VMEM are
            # counted; the sum can exceed HBM peak x time) — reported
            # as a workload-shape diagnostic only.
            rec["xla_bytes_accessed"] = round(cost16["bytes"])
        if cost16["optimal_s"] > 0:  # negative/0 on some backends
            # XLA's own roofline estimate of the step's best case;
            # measured/optimal is the honest 'distance from the
            # compiler's roofline' ratio.
            rec["xla_optimal_step_ms"] = round(
                cost16["optimal_s"] * 1e3, 3)
            rec["vs_xla_optimal"] = round(dt / cost16["optimal_s"], 2)
    try:
        rec.update(_bench_resample(batch, slope_time))
    except Exception as e:  # roofline probes must not kill the bench
        rec["roofline_error"] = repr(e)[:200]

    # Secondary measured paths (VERDICT r4 #6): a regression in the
    # sss-recipe step, the warm epoch loop, or serving must surface in
    # the driver JSON, not only in RESULTS.md. Each probe is fenced —
    # a failure reports instead of killing the headline.
    try:
        # dragon_sss-shaped step (depth 1024, cached bf16).
        model_s = _make_model(RES, RES, 1024, BS,
                              compute_dtype="bfloat16")
        state_s = train_mod.init_state(model_s, tx, jax.random.PRNGKey(0))
        step_s = train_mod.make_train_step(
            model_s, tx, with_vis=True, cached_statics=True)
        extract_s = train_mod.make_static_extractor(model_s)
        statics_s = extract_s(state_s["params"], batch)
        dt_sss, _ = measure(step_s, state_s, extra=(statics_s,))
        rec["sss_step_time_s"] = round(dt_sss, 5)
        del model_s, state_s, step_s, statics_s
    except Exception as e:
        rec["sss_error"] = repr(e)[:200]
    try:
        rec["warm_loop_s_per_batch"] = round(_bench_warm_loop(
            _model, tx, (BS, RES)), 5)
    except Exception as e:
        rec["warm_loop_error"] = repr(e)[:200]
    try:
        rec.update(_bench_serving(RES, DEPTH))
    except Exception as e:
        rec["serving_error"] = repr(e)[:200]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
