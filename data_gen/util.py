"""Shared data-generation utilities.

Re-implementation of the reference's offline helpers (reference:
data_gen/util.py): remap (UV<->camera resampling with the black-corner
background trick), blue-channel padding for warp visualization, float16
warp storage, and JSON helpers. Pure numpy/PIL — no cv2 dependency.
"""

import json

import numpy as np


def load_json(path):
    with open(path, "r") as h:
        return json.load(h)


def dump_json(data, path):
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as h:
        json.dump(data, h, indent=4)


def safe_cast_to_int(x):
    assert abs(x - round(x)) < 1e-6, "Not an integer: %s" % x
    return int(round(x))


def add_b_ch(rg):
    """Pad an (H, W, 2) warp field with a zero blue channel so it can be
    visualized as an RGB image (reference: data_gen/util.py:61-64)."""
    assert rg.ndim == 3 and rg.shape[2] == 2
    return np.concatenate(
        [rg, np.zeros_like(rg[:, :, :1])], axis=2)


def save_float16_npy(arr, path):
    """Warp fields are stored float16 for IO speed
    (reference: data_gen/util.py:67-70)."""
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(arr).astype(np.float16))


def splat_unstruct(locs, vals, grid_hw, max_l1_interp=4, fill_value=0.0):
    """Scatter sparse samples onto a grid the reference's way: nearest-
    neighbor griddata splat with an L1 trust radius — the pipeline that
    makes real scenes' warp fields discontinuous at UV-island seams,
    holed where no sample lands within the radius, and nearest-filled
    (not interpolated) across occlusion boundaries (reference:
    data_gen/render.py:279-351 `calc_bidir_mapping` +
    third_party/xiuminglib/xiuminglib/img.py:289-398
    `grid_query_unstruct` with max_l1_interp=4).

    Image-convention (x right, y DOWN) wrapper over the framework's
    grid_query_unstruct (which keeps the reference's v-up sample
    convention).

    Args:
        locs: (N, 2) normalized sample locations, image convention.
        vals: (N, M) values at those locations.
        grid_hw: (H, W) of the output grid.
        max_l1_interp: trust radius in pixels.
        fill_value: background fill (the reference uses 0 = black so
            warp consumers hit the blacked-out corner texel).

    Returns:
        (H, W, M) splatted grid.
    """
    import os
    import sys
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if _repo not in sys.path:
        sys.path.insert(0, _repo)
    from nlt_tpu.utils.grid import grid_query_unstruct

    locs = np.asarray(locs, np.float64)
    vals = np.asarray(vals, np.float64)
    if vals.ndim == 1:
        vals = vals[:, None]
    uvs = np.stack([locs[:, 0], 1.0 - locs[:, 1]], axis=-1)  # y->v up
    out = grid_query_unstruct(
        uvs, vals, grid_hw,
        method={"func_underlying": "nearest",
                "fill_value": (fill_value,),
                "max_l1_interp": max_l1_interp})
    return out.astype(np.float32)


def remap(img, warp):
    """Bilinear resample `img` through a normalized warp field.

    warp: (Ho, Wo, >=2) where warp[..., 0] is the normalized x (width)
    source coordinate and warp[..., 1] the normalized y, scaled by the
    SOURCE image size before sampling — the same convention the model's
    on-device resampler uses (reference: data_gen/util.py:45-58 via
    cv2.remap; nlt/models/nlt.py:104-106). The source's top-left pixel is
    forced to 0 first so background entries (warp == 0) sample black.
    """
    img = np.asarray(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w = img.shape[:2]
    img = img.copy()
    img[0, 0] = 0  # black-corner background trick

    x = warp[:, :, 0] * w
    y = warp[:, :, 1] * h
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = np.clip(xi, 0, w - 1)
        yi_c = np.clip(yi, 0, h - 1)
        return img[yi_c, xi_c] * inb[..., None]

    out = (tap(x0, y0) * (1 - tx) * (1 - ty)
           + tap(x0 + 1, y0) * tx * (1 - ty)
           + tap(x0, y0 + 1) * (1 - tx) * ty
           + tap(x0 + 1, y0 + 1) * tx * ty)
    if squeeze:
        out = out[:, :, 0]
    return out
