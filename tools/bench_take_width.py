"""Standalone flat-row-gather cost vs row width on the current chip.

The production resampler does ONE flat take of 4C-wide (48 B) window
rows (ops/resample.py). The alternative never measured standalone —
four takes of C-wide (12 B) rows, one per bilinear corner, batch
folded into the row index (NOT the vmapped batched gather that was
measured catastrophic) — is cheaper iff narrow-row gathers cost
sub-proportionally per byte. This bench times both shapes chained.

Usage: python tools/bench_take_width.py [--rows 1048576]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1 << 20)
    p.add_argument("--table_rows", type=int, default=1 << 20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _enable_compile_cache
    from nlt_tpu.utils.timing import slope_time

    _enable_compile_cache()
    rng = np.random.RandomState(0)
    idx = jnp.asarray(
        rng.randint(0, args.table_rows, args.rows), jnp.int32)
    # Four corner index vectors (as the 4-take variant would use).
    idx4 = [jnp.asarray(
        rng.randint(0, args.table_rows, args.rows), jnp.int32)
        for _ in range(4)]
    t12 = jnp.asarray(
        rng.uniform(size=(args.table_rows, 3)), jnp.float32)
    t48 = jnp.asarray(
        rng.uniform(size=(args.table_rows, 12)), jnp.float32)

    def timed(fn, *xs):
        f = jax.jit(fn)
        s0 = f(*xs)
        float(s0)

        def run_n(n):
            s = jnp.float32(0.0)
            for _ in range(n):
                s = f(*xs) + 0.0 * s
            float(s)

        return slope_time(run_n, n1=5, n2=25, reps=3)

    # Reduce over EVERY gathered column: a [:, :1] slice would let
    # XLA sink the slice into the gather's slice_sizes and shrink the
    # wide take to a narrow one, invalidating the comparison.
    dt48 = timed(lambda t: jnp.sum(jnp.take(t, idx, axis=0)), t48)
    dt12 = timed(lambda t: jnp.sum(jnp.take(t, idx, axis=0)), t12)
    dt12x4 = timed(
        lambda t: sum(jnp.sum(jnp.take(t, i, axis=0)) for i in idx4),
        t12)
    r = args.rows
    print("rows=%d  48B-row take: %.3f ms (%.2f ns/row)" % (
        r, dt48 * 1e3, dt48 / r * 1e9))
    print("rows=%d  12B-row take: %.3f ms (%.2f ns/row)" % (
        r, dt12 * 1e3, dt12 / r * 1e9))
    print("rows=%d  4x 12B-row takes: %.3f ms (%.2f ns/row total)" % (
        r, dt12x4 * 1e3, dt12x4 / r * 1e9))


if __name__ == "__main__":
    main()
