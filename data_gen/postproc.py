"""Postprocessing: albedo estimation, diffuse bases, and the file-list
JSON that training consumes.

Re-implementation of the reference's postprocessing (reference:
data_gen/postproc.py:50-122):

1. albedo ~= per-texel mean of all trainvali UV-space rgb renders,
   normalized by its max (:55-64);
2. per-config diffuse.png = albedo * lvis (the "diffuse base"), and
   diffuse_camspc.png = diffuse resampled to camera space through
   uv2cam (:66-82);
3. file-list JSON keyed by ID with per-config relative paths and a
   'complete' existence flag the dataset honors (:89-122).

Run:  python data_gen/postproc.py --data_root=<root> [--out_json=<path>]
"""

import argparse
import os
from glob import glob
from os.path import basename, exists, join, relpath

import numpy as np
from PIL import Image

from util import dump_json, remap

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--data_root", type=str, required=True)
parser.add_argument("--out_json", type=str, default=None,
                    help="defaults to <data_root>.json")


def _load01(path):
    """Load an image as [0,1] float32, normalizing by DTYPE (a
    value-range check would treat a nearly-black uint8 image, e.g. a
    fully shadowed lvis with max pixel 1, as already normalized and
    leave it ~255x too bright)."""
    img = Image.open(path)
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) / 65535.0
    return arr.astype(np.float32)


def _write01(arr, path):
    arr = (np.clip(arr, 0, 1) * 255).round().astype(np.uint8)
    Image.fromarray(arr).save(path)


def compute_albedo(data_root):
    """Mean of all trainvali UV rgb renders, normalized by max
    (reference: data_gen/postproc.py:55-64)."""
    rgbs = []
    for config_dir in sorted(glob(join(data_root, "trainvali_*"))):
        rgb_f = join(config_dir, "rgb.png")
        if exists(rgb_f):
            rgbs.append(_load01(rgb_f)[:, :, :3])
    assert rgbs, "No trainvali rgb.png found under %s" % data_root
    albedo = np.mean(np.stack(rgbs), axis=0)
    albedo = albedo / albedo.max()
    return albedo


def gen_diffuse(data_root, albedo):
    """Per-config diffuse base in UV and camera space
    (reference: data_gen/postproc.py:66-82)."""
    for config_dir in sorted(glob(join(data_root, "*"))):
        if not os.path.isdir(config_dir):
            continue
        lvis_f = join(config_dir, "lvis.png")
        uv2cam_f = join(config_dir, "uv2cam.npy")
        if not (exists(lvis_f) and exists(uv2cam_f)):
            continue
        lvis = _load01(lvis_f)
        diffuse = albedo * lvis[:, :, None]
        _write01(diffuse, join(config_dir, "diffuse.png"))
        uv2cam = np.load(uv2cam_f).astype(np.float32)
        diffuse_camspc = remap(diffuse, uv2cam)
        _write01(diffuse_camspc, join(config_dir, "diffuse_camspc.png"))


def gen_file_list(data_root, out_json):
    """File-list JSON with per-ID relative paths and 'complete' flags
    (reference: data_gen/postproc.py:89-122)."""
    filelist = {}
    for config_dir in sorted(glob(join(data_root, "*"))):
        if not os.path.isdir(config_dir):
            continue
        id_ = basename(config_dir)
        filelist[id_] = {
            "cam": join(config_dir, "cam.json"),
            "cvis": join(config_dir, "cvis.png"),
            "diffuse": join(config_dir, "diffuse.png"),
            "light": join(config_dir, "light.json"),
            "lvis": join(config_dir, "lvis.png"),
            "nn": join(config_dir, "nn.json"),
            "uv2cam": join(config_dir, "uv2cam.npy"),
        }
        if id_.startswith("trainvali_"):
            filelist[id_]["alpha"] = join(config_dir, "alpha.png")
            filelist[id_]["rgb"] = join(config_dir, "rgb.png")
            filelist[id_]["rgb_camspc"] = join(config_dir, "rgb_camspc.png")

        all_exist = all(exists(v) for v in filelist[id_].values())
        filelist[id_]["complete"] = all_exist
        for k, v in filelist[id_].items():
            if k != "complete":
                filelist[id_][k] = relpath(v, data_root)
    dump_json(filelist, out_json)
    return filelist


def main(args):
    out_json = args.out_json or args.data_root.rstrip("/") + ".json"
    albedo = compute_albedo(args.data_root)
    _write01(albedo, join(args.data_root, "albedo.png"))
    gen_diffuse(args.data_root, albedo)
    filelist = gen_file_list(args.data_root, out_json)
    n_complete = sum(1 for v in filelist.values() if v["complete"])
    print("File list: %d IDs (%d complete) -> %s"
          % (len(filelist), n_complete, out_json))


if __name__ == "__main__":
    main(parser.parse_args())
