"""Drive data_gen/render.py end to end under the fake Blender API
(tests/fake_bpy.py): analytic-sphere raycasts, Lambert 'Cycles',
lat-long unwrap. Validates the render shell's control flow and its
full on-disk contract — the piece of SURVEY §2.2 that previously ran
only under real Blender (reference: data_gen/render.py)."""

import importlib
import os
import pickle
import sys
from os.path import join

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, join(REPO, "data_gen"))
sys.path.insert(0, REPO)

from tests import fake_bpy  # noqa: E402


@pytest.fixture()
def render_mod():
    fake_bpy.install()
    for name in ("render",):
        sys.modules.pop(name, None)
    mod = importlib.import_module("render")
    yield mod
    for name in ("bpy", "mathutils", "mathutils.bvhtree", "bmesh",
                 "render"):
        sys.modules.pop(name, None)


def _write_scene_inputs(tmp_path):
    from util import dump_json

    scene = str(tmp_path / "scene.blend")
    open(scene, "wb").write(b"fake blend")

    unwrap = str(tmp_path / "unwrap.pickle")
    with open(unwrap, "wb") as h:
        pickle.dump(fake_bpy.unwrap_table(), h)

    cam = {
        "name": "C00", "position": [0.0, 0.0, 3.5],
        "rotation": [0.0, 0.0, 0.0],
        "focal_length": 35.0, "sensor_width": 32.0,
        "sensor_height": 32.0, "clip_start": 0.1, "clip_end": 100.0,
    }
    light = {"name": "L000", "position": [2.0, 2.0, 4.0], "size": 0.1}
    cam_f = str(tmp_path / "C00.json")
    light_f = str(tmp_path / "L000.json")
    dump_json(cam, cam_f)
    dump_json(light, light_f)
    cam_nn = str(tmp_path / "cams.json")
    light_nn = str(tmp_path / "lights.json")
    dump_json({"C00": "C01"}, cam_nn)
    dump_json({"L000": "L001"}, light_nn)
    # Optional k-lists (get_neighbors --k).
    dump_json({"C00": ["C01", "C02"]}, str(tmp_path / "cams_k.json"))
    dump_json({"L000": ["L001", "L002"]},
              str(tmp_path / "lights_k.json"))
    return scene, unwrap, cam_f, light_f, cam_nn, light_nn


def test_render_shell_end_to_end(tmp_path, render_mod):
    from PIL import Image
    from util import load_json

    scene, unwrap, cam_f, light_f, cam_nn, light_nn = (
        _write_scene_inputs(tmp_path))
    outdir = str(tmp_path / "out")

    import argparse
    args = argparse.Namespace(
        scene=scene, cached_uv_unwrap=unwrap, cam_json=cam_f,
        light_json=light_f, cam_nn_json=cam_nn, light_nn_json=light_nn,
        imh=48, uvs=48, spp=8, outdir=outdir, debug=True)
    render_mod.main(args)

    # Full on-disk contract (reference: data_gen/postproc.py:96-108).
    for f in ("rgb_camspc.png", "alpha.png", "uv2cam.npy", "cam2uv.npy",
              "cvis.png", "lvis.png", "rgb.png", "cam.json",
              "light.json", "nn.json", "uv2cam.png", "cam2uv.png"):
        assert os.path.exists(join(outdir, f)), f

    # Warp fields: float16 (the IO-speed contract), normalized range.
    uv2cam = np.load(join(outdir, "uv2cam.npy"))
    cam2uv = np.load(join(outdir, "cam2uv.npy"))
    assert uv2cam.dtype == np.float16 and uv2cam.shape == (48, 48, 2)
    assert cam2uv.dtype == np.float16 and cam2uv.shape == (48, 48, 2)
    assert 0 <= float(uv2cam.astype(np.float32).min())
    assert float(uv2cam.astype(np.float32).max()) <= 1.0

    alpha = np.asarray(
        Image.open(join(outdir, "alpha.png")), np.float32) / 255.0
    assert alpha[24, 24] > 0.99   # sphere center hit
    assert alpha[0, 0] < 0.01     # corner is background
    # The sphere's angular radius at distance 3.5 with f35/32mm covers
    # a central disk — the foreground should be a substantial minority.
    fg = (alpha > 0.5).mean()
    assert 0.05 < fg < 0.9, fg

    # View cosines (UV space): defined on observed texels, in [0, 1].
    cvis = np.asarray(
        Image.open(join(outdir, "cvis.png")), np.float32) / 255.0
    assert cvis.max() > 0.8  # somewhere the surface faces the camera

    # nn.json carries the 1-NN names AND the k-lists when present.
    nn = load_json(join(outdir, "nn.json"))
    assert nn["cam"] == "C01" and nn["light"] == "L001"
    assert nn["cams"] == ["C01", "C02"]
    assert nn["lights"] == ["L001", "L002"]

    # --debug round trip (reference: data_gen/render.py:180-194): the
    # UV rgb warped back through uv2cam reproduces the camera render
    # on confidently-mapped pixels.
    repro = np.asarray(Image.open(
        join(outdir, "rgb_camspc_repro.png")), np.float32) / 255.0
    camspc = np.asarray(Image.open(
        join(outdir, "rgb_camspc.png")), np.float32) / 255.0
    mapped = (np.abs(uv2cam.astype(np.float32)).sum(-1) > 0)
    # Erode the mask: boundary texels interpolate across the silhouette.
    core = mapped.copy()
    for s in (1, -1):
        core &= np.roll(mapped, s, axis=0) & np.roll(mapped, s, axis=1)
    assert core.sum() > 100
    err = np.abs(repro - camspc).mean(axis=-1)[core]
    assert np.median(err) < 0.15, float(np.median(err))


def test_render_shell_gates_without_bpy(tmp_path):
    """Without the fake installed, importing render raises the
    documented ImportError pointing at synthesize.py."""
    for name in ("bpy", "render"):
        sys.modules.pop(name, None)
    with pytest.raises(ImportError, match="synthesize"):
        importlib.import_module("render")
    sys.modules.pop("render", None)
