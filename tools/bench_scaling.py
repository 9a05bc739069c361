"""Scaling harness: sharded-train-step throughput across mesh sizes.

The reference has no multi-device benchmark (distributed training "was
not heavily tested"; reference: nlt/README.md:66-69). This harness runs
the full jitted training step over 1..N-device meshes and reports
texels/s and scaling efficiency.

On real hardware run it on a pod slice; in the hermetic environment it
runs on virtual CPU devices (set --cpu_devices), which validates the
sharding/collective structure but NOT real ICI performance.

Run:
    python tools/bench_scaling.py --cpu_devices=8 --res=64 --depth=32
    python tools/bench_scaling.py --res=512 --depth=256   # on a slice
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("--cpu_devices", type=int, default=0,
                help="force a virtual CPU backend with N devices")
ap.add_argument("--res", type=int, default=64)
ap.add_argument("--depth", type=int, default=32)
ap.add_argument("--per_device_bs", type=int, default=2)
ap.add_argument("--n_tile", type=int, default=1)
ap.add_argument("--steps", type=int, default=10)
args = ap.parse_args()

if args.cpu_devices:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=%d" % args.cpu_devices)

import jax  # noqa: E402

if args.cpu_devices:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from __graft_entry__ import _make_batch, _make_model  # noqa: E402
from nlt_tpu.parallel import mesh as mesh_mod  # noqa: E402
from nlt_tpu.parallel import train as train_mod  # noqa: E402


def run(n_dev):
    devices = jax.devices()[:n_dev]
    n_tile = (args.n_tile
              if args.n_tile >= 1 and n_dev % args.n_tile == 0 else 1)
    mesh = mesh_mod.make_mesh(
        n_data=n_dev // n_tile, n_tile=n_tile, devices=devices)
    bs = args.per_device_bs * (n_dev // n_tile)
    model = _make_model(args.res, args.res, args.depth, bs, loss="barron")
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    step = train_mod.make_train_step(model, tx, mesh=mesh)
    batch = mesh_mod.shard_batch(
        mesh, _make_batch(bs, args.res, args.res),
        tile_spatial=n_tile > 1)
    state, loss, vis = step(state, batch)
    float(loss)

    # Chained-run slope timing (nlt_tpu/utils/timing.py): the honest
    # method on this stack — block_until_ready does not synchronize.
    from nlt_tpu.utils.timing import slope_time
    box = {"state": state}

    def run_n(n):
        s = box["state"]
        for _ in range(n):
            s, loss, _ = step(s, batch)
        float(loss)
        box["state"] = s

    dt = slope_time(run_n, n1=max(2, args.steps // 4),
                    n2=max(6, args.steps), reps=3)
    texels = bs * args.res * args.res
    return texels / dt, dt, bs


def main():
    n_total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    base_rate = None
    print("devices  global_bs  step_ms   texels/s     efficiency")
    for n in sizes:
        rate, dt, bs = run(n)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print("%7d  %9d  %7.2f  %10.3e  %9.1f%%"
              % (n, bs, dt * 1000, rate, 100 * eff))


if __name__ == "__main__":
    main()
