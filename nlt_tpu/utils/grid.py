"""Scatter-to-grid interpolation of unstructured UV samples.

Replaces the xiuminglib routine the offline renderer uses to splat
per-pixel face-UV correspondences into warp-field images (reference:
third_party/xiuminglib/xiuminglib/img.py:289-398 grid_query_unstruct,
used from data_gen/render.py:333-349). Conventions kept:

- sample locations are (u, v) with v UP (math convention); the output
  grid is an image with y DOWN, so row i corresponds to v = 1 - y;
- interpolation via scipy griddata (nearest/linear), channels handled
  independently;
- a "trust radius": pixels farther (L1 distance) than `max_l1_interp`
  from any sample are reset to `fill_value` — nearest-neighbor
  extrapolation beyond a few pixels is garbage for warp fields.

cv2.distanceTransform is replaced by scipy.ndimage's chamfer L1
transform (exact for the cityblock metric).
"""

import numpy as np


def grid_query_unstruct(uvs, values, grid_res, method=None):
    """uvs: (N, 2) sample locations in [0, 1]^2 (v up); values: (N,) or
    (N, M); grid_res: (h, w). Returns (h, w) or (h, w, M)."""
    from scipy.interpolate import griddata
    from scipy.ndimage import distance_transform_cdt

    uvs = np.asarray(uvs, np.float64)
    values = np.asarray(values)
    single_channel = values.ndim == 1
    if single_channel:
        values = values.reshape(-1, 1)
    assert values.ndim == 2 and values.shape[0] == uvs.shape[0]

    if method is None:
        method = {}
    func_underlying = method.get("func_underlying", "linear")
    fill_value = np.array(method.get("fill_value", (0,)), np.float64)
    max_l1_interp = method.get("max_l1_interp", np.inf)
    if max_l1_interp is None:
        max_l1_interp = np.inf
    if len(fill_value) == 1:
        fill_value = np.tile(fill_value, values.shape[1])
    assert len(fill_value) == values.shape[1]

    h, w = grid_res
    grid_x, grid_y = np.meshgrid(
        np.linspace(0, 1, w), np.linspace(0, 1, h))
    grid_u, grid_v = grid_x, 1 - grid_y  # image y-down -> math v-up

    # Trust mask: L1 distance (in pixels) to the nearest sample.
    has_value = np.zeros((h, w), np.uint8)
    ri = ((1 - uvs[:, 1]) * (h - 1)).astype(int).ravel()
    ci = (uvs[:, 0] * (w - 1)).astype(int).ravel()
    in_canvas = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
    has_value[ri[in_canvas], ci[in_canvas]] = 1
    if np.isfinite(max_l1_interp):
        dist2val = distance_transform_cdt(
            1 - has_value, metric="taxicab")
        trusted = dist2val <= max_l1_interp
    else:
        trusted = np.ones((h, w), bool)

    out = np.empty((h, w, values.shape[1]), np.float64)
    for ch in range(values.shape[1]):
        interp = griddata(
            uvs, values[:, ch], (grid_u, grid_v),
            method=func_underlying, fill_value=fill_value[ch])
        interp[~trusted] = fill_value[ch]
        out[:, :, ch] = interp
    if single_channel:
        return out[:, :, 0]
    return out
