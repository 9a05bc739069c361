"""Honest device timing on backends with lying synchronization.

On this container's axon TPU backend, ``jax.block_until_ready`` returns
without waiting for remote execution (a 4096^3 matmul chain "timed" at
5000 TFLOP/s that way — physically impossible), and any host value
fetch pays a ~25-30 ms tunnel round trip. Timing a loop bracketed by
``block_until_ready`` therefore measures dispatch overhead, not device
time; timing one fetch-synchronized run conflates the round trip.

The honest per-iteration time is the SLOPE between two chained-run
lengths, each synchronized by fetching a value to the host:

    per_iter = (T(n2) - T(n1)) / (n2 - n1)

which cancels both the round-trip constant and per-run dispatch
overheads. The iterations MUST be chained (each consuming the previous
output) so the device cannot overlap them.
"""

import time

import numpy as np


def slope_time(run_n, n1=5, n2=15, reps=3):
    """Median per-iteration seconds via two-point slope timing.

    Args:
        run_n: callable(n) that executes n CHAINED iterations and then
            synchronizes by fetching a value to the host (e.g.
            ``float(loss)``), returning nothing or anything.
        n1, n2: the two run lengths (n2 > n1).
        reps: slope samples to take; the median is returned.

    Returns:
        Median seconds per iteration.
    """
    assert n2 > n1 > 0
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_n(n1)
        t_1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_n(n2)
        t_2 = time.perf_counter() - t0
        samples.append((t_2 - t_1) / (n2 - n1))
    return float(np.median(samples))
