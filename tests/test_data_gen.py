"""Offline data-generation tests: grid scatter interpolation, render math
(cosines, bidirectional mapping), remap round-trip, neighbor finding, and
the job-manifest generator (reference behaviors: data_gen/render.py:209-351,
gen_render_params_expects.py:100-182, get_neighbors.py:52-71)."""

import os
import subprocess
import sys
from os.path import join

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, join(REPO, "data_gen"))

from nlt_tpu.utils.grid import grid_query_unstruct  # noqa: E402
import render_math  # noqa: E402
import util as dg_util  # noqa: E402


def test_grid_query_unstruct_hits_samples():
    """Samples at grid corners reproduce their values."""
    uvs = np.array([[0.0, 1.0], [1.0, 1.0], [0.0, 0.0], [1.0, 0.0]])
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    out = grid_query_unstruct(
        uvs, vals, (4, 4),
        method={"func_underlying": "nearest", "max_l1_interp": np.inf})
    # v-up convention: (0,1) is top-left of the image
    assert out[0, 0] == 1.0 and out[0, 3] == 2.0
    assert out[3, 0] == 3.0 and out[3, 3] == 4.0


def test_grid_query_unstruct_trust_radius():
    """Far-away pixels fall back to fill_value with a finite L1 trust
    radius (reference: xiuminglib img.py:372-398)."""
    uvs = np.array([[0.5, 0.5]])
    vals = np.array([7.0])
    out = grid_query_unstruct(
        uvs, vals, (33, 33),
        method={"func_underlying": "nearest", "fill_value": (0,),
                "max_l1_interp": 2})
    assert out[16, 16] == 7.0
    assert out[0, 0] == 0.0
    assert (out == 7.0).sum() <= 13  # L1 ball of radius 2


def test_grid_query_multichannel():
    uvs = np.random.RandomState(0).uniform(0.2, 0.8, (50, 2))
    vals = np.random.RandomState(1).uniform(size=(50, 3))
    out = grid_query_unstruct(
        uvs, vals, (16, 16),
        method={"func_underlying": "nearest", "max_l1_interp": np.inf})
    assert out.shape == (16, 16, 3)


def test_view_cosines_head_on():
    """A surface facing the camera has cosine 1 at the center pixel."""
    xys = np.array([[1, 1], [0, 0]])
    hit_mask = np.array([True, False])
    locs = np.array([[0.0, 0.0, 0.0], [0, 0, 0]])
    normals = np.array([[0.0, 0.0, 1.0], [0, 0, 0]])
    out = render_math.calc_view_cosines(
        [0, 0, 5], xys, hit_mask, locs, normals, 3, 3)
    np.testing.assert_allclose(out[1, 1], 1.0)
    assert out[0, 0] == 0.0


def test_light_cosines_with_occlusion():
    xys = np.array([[0, 0], [1, 0]])
    hit_mask = np.array([True, True])
    locs = np.zeros((2, 3))
    normals = np.tile([[0.0, 0.0, 1.0]], (2, 1))
    occluded = np.array([False, True])
    out = render_math.calc_light_cosines(
        [0, 0, 3], xys, hit_mask, locs, normals, occluded, 1, 2)
    np.testing.assert_allclose(out[0, 0], 1.0)
    assert out[0, 1] == 0.0  # in cast shadow


def test_bidir_mapping_identity_plane():
    """A flat quad whose UV unwrap equals its screen position should give
    near-identity warp fields."""
    imh = imw = uvs = 16
    # One 'face' per pixel, each with its own UV = pixel position (v-up).
    xs, ys = np.meshgrid(range(imw), range(imh))
    xys = np.dstack((xs, ys)).reshape(-1, 2)
    hit_mask = np.ones(len(xys), bool)
    face_i = np.arange(len(xys))
    face_uvs = {}
    for i, (x, y) in enumerate(xys):
        u = (x + 0.5) / imw
        v = 1 - (y + 0.5) / imh
        face_uvs[i] = np.array([[u, v]])
    uv2cam, cam2uv = render_math.calc_bidir_mapping(
        face_uvs, xys, hit_mask, face_i, imh, imw, uvs, max_l1_interp=4)
    # uv2cam: camera pixel (y, x) should point at ~its own normalized loc
    ys_n = (np.arange(imh) + 0.5) / imh
    xs_n = (np.arange(imw) + 0.5) / imw
    gx, gy = np.meshgrid(xs_n, ys_n)
    np.testing.assert_allclose(uv2cam[:, :, 0], gx, atol=0.1)
    np.testing.assert_allclose(uv2cam[:, :, 1], gy, atol=0.1)
    np.testing.assert_allclose(cam2uv[:, :, 0], gx, atol=0.1)
    np.testing.assert_allclose(cam2uv[:, :, 1], gy, atol=0.1)


def test_remap_identity():
    rng = np.random.RandomState(0)
    img = rng.uniform(0.2, 1, (8, 8, 3)).astype(np.float32)
    img[0, 0] = 0.5
    xs, ys = np.meshgrid(np.arange(8), np.arange(8))
    warp = np.stack([(xs + 0.0) / 8, (ys + 0.0) / 8], axis=-1)
    out = dg_util.remap(img, warp)
    # Identity warp samples exact pixels (coords scale to integers)
    np.testing.assert_allclose(out[1:, 1:], img[1:, 1:], atol=1e-6)
    # (0,0) got blacked by the corner trick
    np.testing.assert_allclose(out[0, 0], 0.0)


def test_remap_background_black():
    img = np.ones((4, 4))
    warp = np.zeros((2, 2, 2))
    out = dg_util.remap(img, warp)
    np.testing.assert_allclose(out, 0.0)


def test_gen_render_params_expects(tmp_path):
    # Fake inputs
    for d in ("cams", "lights", "tcams", "tlights"):
        os.makedirs(tmp_path / d)
    for i in range(3):
        (tmp_path / "cams" / ("C%02d.json" % i)).write_text("{}")
    for i in range(2):
        (tmp_path / "lights" / ("L%03d.json" % i)).write_text("{}")
    for i in range(2):
        (tmp_path / "tcams" / ("P%02d.json" % i)).write_text("{}")
        (tmp_path / "tlights" / ("T%03d.json" % i)).write_text("{}")

    out = subprocess.run(
        [sys.executable, join(REPO, "data_gen",
                              "gen_render_params_expects.py"),
         "--scene", "s.blend", "--cached_uv_unwrap", "u.pickle",
         "--cam_dir", str(tmp_path / "cams"),
         "--light_dir", str(tmp_path / "lights"),
         "--test_cam_dir", str(tmp_path / "tcams"),
         "--test_light_dir", str(tmp_path / "tlights"),
         "--cam_nn_json", "cn.json", "--light_nn_json", "ln.json",
         "--outroot", str(tmp_path / "out"),
         "--out_prefix", str(tmp_path) + "/"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    params = open(tmp_path / "render_params.txt").read().strip().split("\n")
    expects = open(tmp_path / "render_expects.txt").read().strip().split(
        "\n")
    assert len(params) == 3 * 2 + 2  # product + 1:1 test pairs
    assert len(expects) == len(params)
    assert "trainvali_000000000_C00_L000" in params[0]
    assert "--imh=512" in params[0]
    assert any("test_000000000_P00_T000" in line for line in params)
    # Test jobs expect no rgb.png (no GT for virtual configs)
    assert "rgb.png" in expects[0]
    assert "rgb.png" not in expects[-1]


def test_get_neighbors(tmp_path):
    from get_neighbors import get_neighbors
    physical = {
        "A": np.array([0.0, 0, 0]),
        "B": np.array([1.0, 0, 0]),
        "C": np.array([5.0, 0, 0])}
    nn = get_neighbors(physical)
    assert nn == {"A": "B", "B": "A", "C": "B"}
    queries = {"Q": np.array([4.9, 0, 0])}
    nn2 = get_neighbors(physical, queries)
    assert nn2 == {"Q": "C"}


def test_blender_scripts_gate_cleanly():
    """render.py / uv_unwrap.py must fail with a clear ImportError (not a
    crash) outside Blender."""
    for script in ("render.py", "uv_unwrap.py"):
        out = subprocess.run(
            [sys.executable, join(REPO, "data_gen", script)],
            capture_output=True, text=True)
        assert out.returncode != 0
        assert "Blender" in out.stderr


def test_synthesize_identity_uv(tmp_path):
    """--identity_uv: camera space is UV space, identity warps masked by
    alpha (the reference README's fixed-view simplification)."""
    root = str(tmp_path / "ident")
    out = subprocess.run(
        [sys.executable, join(REPO, "data_gen", "synthesize.py"),
         "--outroot", root, "--n_cams", "1", "--n_lights", "3",
         "--n_test", "1", "--imh", "32", "--uvs", "32", "--identity_uv"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    d = join(root, sorted(os.listdir(root))[1])  # first config dir
    warp = np.load(join(d, "uv2cam.npy")).astype(np.float32)
    from PIL import Image
    alpha = np.asarray(Image.open(join(d, "alpha.png")), np.float32) / 255
    fg = alpha > 0.5
    ys, xs = np.meshgrid((np.arange(32) + .5) / 32, (np.arange(32) + .5) / 32,
                         indexing="ij")
    np.testing.assert_allclose(warp[fg][:, 0], xs[fg], atol=2e-3)
    np.testing.assert_allclose(warp[fg][:, 1], ys[fg], atol=2e-3)
    np.testing.assert_allclose(warp[~fg], 0.0, atol=1e-6)
    # UV rgb == camera rgb
    rgb = np.asarray(Image.open(join(d, "rgb.png")))
    rgb_cam = np.asarray(Image.open(join(d, "rgb_camspc.png")))
    np.testing.assert_array_equal(rgb, rgb_cam)
