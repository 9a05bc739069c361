"""Offline fitter for the robust-loss log-partition spline.

Numerically integrates Z(alpha) over a dense grid of the curved alpha
parameterization and stores cubic-Hermite knots (values + Catmull-Rom
tangents) to nlt_tpu/data/partition_spline.npz. This regenerates, from
scratch, the artifact the reference ships as
third_party/robust_loss/data/partition_spline.npz (produced there by
fit_partition_spline.py with mpmath); no data is copied.

Run:  python tools/fit_partition_spline.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nlt_tpu.ops.distribution import (  # noqa: E402
    numerical_base_partition_function)


def inv_curve_np(x):
    """Float64 numpy inverse of partition_spline_curve."""
    x = np.asarray(x, np.float64)
    lo = 0.5 * x + np.where(
        x <= 4,
        1.25 - np.sqrt(np.maximum(1.5625 - x + 0.25 * x * x, 0.0)),
        -1.25 + np.sqrt(np.maximum(9.5625 - 3.0 * x + 0.25 * x * x, 0.0)))
    hi = 3.75 + 0.25 * np.exp(np.minimum(x * 3.6 - 28.8, 87.5))
    return np.where(x < 8, lo, hi)


def main(n_knots=4096, x_max=12.0, out_path=None):
    # n_knots=4096 places the curve's breakpoints t=4 (alpha=2) and t=8
    # exactly on knots (4 / (12/4095) = 1365), so the curvature kinks of
    # logZ(t) fall between spline segments.
    if out_path is None:
        out_path = os.path.join(
            os.path.dirname(__file__), "..", "nlt_tpu", "data",
            "partition_spline.npz")

    # Curved-domain grid at half-knot spacing: even indices are knots, odd
    # indices feed the central-difference tangents. interpolate1d places
    # knots at integer positions, so queries scale by (n-1)/x_max.
    n_fine = 2 * n_knots - 1
    t = np.linspace(0.0, x_max, n_fine)
    alphas = inv_curve_np(t)
    alphas[0] = 0.0

    log_z_fine = np.empty(n_fine, np.float64)
    for i, a in enumerate(alphas):
        log_z_fine[i] = np.log(numerical_base_partition_function(a))
        if i % 512 == 0:
            print("point %d/%d  alpha=%.6g  logZ=%.9g"
                  % (i, n_fine, a, log_z_fine[i]))

    log_z = log_z_fine[0::2]
    # Tangents in knot-index units: d(logZ)/d(knot) ~= f[2k+1] - f[2k-1].
    tangents = np.empty(n_knots, np.float64)
    tangents[1:-1] = log_z_fine[3::2] - log_z_fine[1:-2:2]
    tangents[0] = 2.0 * (log_z_fine[1] - log_z_fine[0])
    tangents[-1] = 2.0 * (log_z_fine[-1] - log_z_fine[-2])

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(
        out_path,
        x_scale=np.float64((n_knots - 1) / x_max),
        values=log_z.astype(np.float64),
        tangents=tangents.astype(np.float64))
    print("Wrote %s (%d knots, x_max=%g)" % (out_path, n_knots, x_max))


if __name__ == "__main__":
    main()
