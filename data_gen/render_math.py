"""Pure-numpy math core of the per-config renderer.

The reference's render.py mixes Blender calls (scene IO, Cycles
rendering, BVH raycasts) with the math that turns ray-hit records into
training buffers (reference: data_gen/render.py:209-351). Here the math
lives in plain numpy functions over plain arrays, so it is unit-testable
without Blender; data_gen/render.py wires them to bpy.

Inputs use "hit records": for each camera pixel (x, y), whether the ray
hit the object, the hit location, normal, and face index.
"""

import os
import sys

import numpy as np

try:
    from nlt_tpu.utils.grid import grid_query_unstruct
except ImportError:  # running as a standalone data_gen script
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nlt_tpu.utils.grid import grid_query_unstruct


def _normalize_rows(v):
    return v / np.maximum(
        np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def calc_view_cosines(cam_loc, xys, hit_mask, locs, normals, imh, imw):
    """Clamped-free cosine between surface normal and direction to the
    camera, per pixel (reference: data_gen/render.py:209-228)."""
    cam_loc = np.asarray(cam_loc, np.float64)
    out = np.zeros((imh, imw))
    if not hit_mask.any():
        return out
    p2c = _normalize_rows(cam_loc[None] - locs[hit_mask])
    n = _normalize_rows(normals[hit_mask])
    cos = np.sum(p2c * n, axis=-1)
    xy = xys[hit_mask]
    out[xy[:, 1], xy[:, 0]] = cos
    return out


def calc_light_cosines(light_loc, xys, hit_mask, locs, normals, occluded,
                       imh, imw):
    """Cosine between normal and direction to the light, zeroed for
    pixels whose surface point is occluded from the light (cast shadow;
    reference: data_gen/render.py:231-276). `occluded` is a boolean
    array aligned with the hit records (from a raycast backend)."""
    light_loc = np.asarray(light_loc, np.float64)
    out = np.zeros((imh, imw))
    take = hit_mask & ~np.asarray(occluded, bool)
    if not take.any():
        return out
    p2l = _normalize_rows(light_loc[None] - locs[take])
    n = _normalize_rows(normals[take])
    cos = np.sum(p2l * n, axis=-1)
    xy = xys[take]
    out[xy[:, 1], xy[:, 0]] = cos
    return out


def calc_bidir_mapping(face_uvs, xys, hit_mask, face_i, imh, imw, uvs,
                       max_l1_interp=4):
    """Bidirectional UV<->camera warp fields from per-pixel face hits.

    face_uvs: dict face_index -> (K, 2) array of that face's vertex UV
    coordinates (v up, the unwrap table contract; reference:
    data_gen/uv_unwrap.py:53-74). Every camera pixel that hit face f
    contributes correspondences between its camera location and all of
    f's vertex UVs, splatted both directions with a nearest-neighbor
    scatter and an L1 trust radius (reference: data_gen/render.py:279-351).

    Returns (uv2cam, cam2uv):
      uv2cam: (imh, imw, 2) normalized UV source coords per camera pixel;
      cam2uv: (uvs, uvs, 2) normalized camera source coords per UV texel.
    """
    uv2cam_locs, uv2cam_vals = [], []
    cam2uv_locs, cam2uv_vals = [], []
    for idx in np.nonzero(hit_mask)[0]:
        fi = face_i[idx]
        if fi is None or fi < 0:
            continue
        uv = np.asarray(face_uvs[fi], np.float64)
        x, y = xys[idx]

        # UV -> camera: at sample location (u, 1-v flipped to image-v
        # convention handled by grid_query_unstruct), the value is the
        # camera-space (x, y) of this pixel (y-down, for remap()).
        camspc_loc = (x / float(imw), 1 - y / float(imh))
        uvspc_val = np.hstack((uv[:, :1], 1 - uv[:, 1:]))
        uv2cam_locs.append(
            np.tile(np.asarray(camspc_loc), (uv.shape[0], 1)))
        uv2cam_vals.append(uvspc_val)

        # camera -> UV: sample at the UVs, value is the normalized
        # camera pixel (y-down).
        cam2uv_locs.append(uv)
        cam2uv_vals.append(np.tile(
            np.asarray((x / float(imw), y / float(imh))),
            (uv.shape[0], 1)))

    method = {
        "func_underlying": "nearest",
        "fill_value": (0,),
        "max_l1_interp": max_l1_interp,
    }
    if not uv2cam_locs:
        return np.zeros((imh, imw, 2)), np.zeros((uvs, uvs, 2))
    uv2cam = grid_query_unstruct(
        np.vstack(uv2cam_locs), np.vstack(uv2cam_vals), (imh, imw),
        method=method)
    cam2uv = grid_query_unstruct(
        np.vstack(cam2uv_locs), np.vstack(cam2uv_vals), (uvs, uvs),
        method=method)
    return uv2cam, cam2uv
