"""Benchmark the host input pipeline in isolation (no device work).

Times cold (first) and warm (cached) epochs of dataset iteration for a
given data root / resolution / cache mode, reporting ms/batch and
MB/s of delivered batch bytes. This is the harness behind RESULTS.md's
"Host input pipeline" table (reference counterpart: none — the
reference hides input cost inside tf.data and never measures it;
nlt/datasets/base.py:98-116).

    python tools/bench_input.py --data_root=/tmp/scene512 --res=512 \
        --cache=disk --device_normalize=1 --bs=4 --epochs=3
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nlt_tpu.datasets import get_dataset_class  # noqa: E402
from nlt_tpu.utils.config import Config  # noqa: E402


def batch_bytes(batch):
    return sum(v.nbytes for v in batch.values()
               if isinstance(v, np.ndarray))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--cache", type=str, default="disk",
                   choices=["False", "ram", "disk"])
    p.add_argument("--device_normalize", type=int, default=1)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--n_workers", type=int, default=16)
    args = p.parse_args()

    config = Config({
        "dataset": "nlt",
        "bs": args.bs,
        "cache": args.cache,
        "device_normalize": bool(args.device_normalize),
        "imh": args.res, "imw": args.res,
        "uvh": args.res, "uvw": args.res,
        "data_root": args.data_root,
        "holdout_cam": "C03",
        "holdout_light": "L003",
    })
    ds = get_dataset_class("nlt")(
        config, "train", n_workers=args.n_workers)
    print("examples: %d, bs: %d" % (len(ds), ds.bs))

    for epoch in range(args.epochs):
        t0 = time.time()
        n, nbytes = 0, 0
        for batch in ds.iterate(seed=epoch):
            n += 1
            nbytes += batch_bytes(batch)
        dt = time.time() - t0
        print("epoch %d (%s): %.1f ms/batch  %.0f MB/s  (%d batches)"
              % (epoch, "cold" if epoch == 0 else "warm",
                 1e3 * dt / n, nbytes / dt / 1e6, n))


if __name__ == "__main__":
    main()
