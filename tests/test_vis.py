"""Visualization-layer tests: APNG writer, HTML gallery, video fallback
(reference artifacts: xiuminglib vis/video.py make_apng, vis/html.py;
used from nlt/models/nlt.py:245-257, 288-320)."""

import os

import numpy as np
from PIL import Image

from nlt_tpu.utils import io as ioutil
from nlt_tpu.vis import html as htmlutil
from nlt_tpu.vis import video as videoutil


def test_make_apng(tmp_path, rng):
    imgs = [rng.uniform(0, 1, (32, 32, 3)) for _ in range(3)]
    out = videoutil.make_apng(
        imgs, labels=["a", "b", "c"], outpath=str(tmp_path / "x.apng"),
        font_size=10)
    im = Image.open(out)
    assert getattr(im, "n_frames", 1) == 3
    assert im.size == (32, 32)


def test_make_apng_uint8_input(tmp_path):
    imgs = [np.zeros((16, 16, 3), np.uint8),
            np.full((16, 16, 3), 255, np.uint8)]
    out = videoutil.make_apng(imgs, outpath=str(tmp_path / "y.apng"))
    assert os.path.exists(out)


def test_html_gallery(tmp_path):
    page = htmlutil.HTML(title="Test Gallery")
    page.add_header("Section")
    table = page.add_table()
    table.add_row(
        ["some metadata", "img0.png"], ["text", "image"],
        captions=["Meta", "Image"])
    table.add_row(["<script>alert(1)</script>", "b.png"],
                  ["text", "image"])
    path = page.save(str(tmp_path / "g.html"))
    content = open(path).read()
    assert "Test Gallery" in content
    assert "<img src='img0.png'" in content
    # Text cells are escaped
    assert "<script>alert" not in content
    assert "&lt;script&gt;" in content


def test_write_video_fallback(tmp_path, rng):
    frames = [rng.uniform(0, 1, (16, 16, 3)) for _ in range(4)]
    out = ioutil.write_video(frames, str(tmp_path / "v.mp4"), fps=2)
    # Either a real mp4 (imageio+ffmpeg) or the documented animated
    # fallback; in both cases the artifact exists.
    assert os.path.exists(out)


def test_write_img_roundtrip(tmp_path, rng):
    arr = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    ioutil.write_img(arr, str(tmp_path / "a.png"))
    back = ioutil.normalize_uint(ioutil.load_img(str(tmp_path / "a.png")))
    np.testing.assert_allclose(back, arr, atol=1.01 / 255)
    # Grayscale (H, W, 1) squeezes
    ioutil.write_img(arr[:, :, :1], str(tmp_path / "g.png"))
    g = ioutil.load_img(str(tmp_path / "g.png"))
    assert g.shape == (8, 8)
