"""Generate render-farm job manifests: per-job CLI parameter lines and
expected-output lines for farm-side failure detection.

Re-implementation of the reference's job generator (reference:
data_gen/gen_render_params_expects.py:100-182). Behavior kept:

- trainvali jobs are the cartesian product of cameras x lights (with
  optional --cam_every / --light_every subsampling); test jobs pair
  virtual cams and lights 1:1 (:112-121, :68, :79);
- render_params.txt has one CLI argument line per job for render.py;
- render_expects.txt lists the artifact paths every job must produce,
  so a farm controller can detect and re-run failures
  (reference: :19-21, 170-175).

Run:
    python data_gen/gen_render_params_expects.py --scene=<.blend> \
        --cached_uv_unwrap=<.pickle> --cam_dir=... --light_dir=... \
        --test_cam_dir=... --test_light_dir=... \
        --cam_nn_json=... --light_nn_json=... \
        --imh=512 --uvs=512 --spp=256 --outroot=... --out_prefix=...
"""

import argparse
import os
from glob import glob
from itertools import product
from os.path import basename, join

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--scene", type=str, required=True)
parser.add_argument("--cached_uv_unwrap", type=str, required=True)
parser.add_argument("--cam_dir", type=str, required=True)
parser.add_argument("--light_dir", type=str, required=True)
parser.add_argument("--test_cam_dir", type=str, default=None)
parser.add_argument("--test_light_dir", type=str, default=None)
parser.add_argument("--cam_nn_json", type=str, required=True)
parser.add_argument("--light_nn_json", type=str, required=True)
parser.add_argument("--cam_every", type=int, default=1)
parser.add_argument("--light_every", type=int, default=1)
parser.add_argument("--imh", type=int, default=512)
parser.add_argument("--uvs", type=int, default=512)
parser.add_argument("--spp", type=int, default=256)
parser.add_argument("--outroot", type=str, required=True)
parser.add_argument("--out_prefix", type=str, required=True,
                    help="prefix for render_params.txt / render_expects.txt")

# Artifacts every job must produce (the training data contract,
# reference: data_gen/postproc.py:96-108 + render.py outputs).
EXPECTED_TRAINVALI = (
    "cam.json", "light.json", "nn.json", "rgb_camspc.png", "alpha.png",
    "rgb.png", "cvis.png", "lvis.png", "uv2cam.npy", "cam2uv.npy")
EXPECTED_TEST = (
    "cam.json", "light.json", "nn.json", "cvis.png", "lvis.png",
    "uv2cam.npy", "cam2uv.npy")


def _sorted_jsons(dir_, every=1):
    if dir_ is None:
        return []
    return sorted(glob(join(dir_, "*.json")))[::every]


def gen_tasks(args):
    """Returns a list of (id, cam_json, light_json, expected_files)."""
    cams = _sorted_jsons(args.cam_dir, args.cam_every)
    lights = _sorted_jsons(args.light_dir, args.light_every)
    test_cams = _sorted_jsons(args.test_cam_dir)
    test_lights = _sorted_jsons(args.test_light_dir)

    tasks = []
    i = 0
    for cam_f, light_f in product(cams, lights):
        cam = basename(cam_f)[:-len(".json")]
        light = basename(light_f)[:-len(".json")]
        id_ = "trainvali_%09d_%s_%s" % (i, cam, light)
        tasks.append((id_, cam_f, light_f, EXPECTED_TRAINVALI))
        i += 1
    # Test: virtual cams and lights paired 1:1
    # (reference: gen_render_params_expects.py:112-121).
    for j, (cam_f, light_f) in enumerate(zip(test_cams, test_lights)):
        cam = basename(cam_f)[:-len(".json")]
        light = basename(light_f)[:-len(".json")]
        id_ = "test_%09d_%s_%s" % (j, cam, light)
        tasks.append((id_, cam_f, light_f, EXPECTED_TEST))
    return tasks


def main(args):
    tasks = gen_tasks(args)
    params_f = args.out_prefix + "render_params.txt"
    expects_f = args.out_prefix + "render_expects.txt"
    os.makedirs(os.path.dirname(params_f) or ".", exist_ok=True)
    with open(params_f, "w") as hp, open(expects_f, "w") as he:
        for id_, cam_f, light_f, expected in tasks:
            outdir = join(args.outroot, id_)
            hp.write(
                "--scene=%s --cached_uv_unwrap=%s --cam_json=%s "
                "--light_json=%s --cam_nn_json=%s --light_nn_json=%s "
                "--imh=%d --uvs=%d --spp=%d --outdir=%s\n"
                % (args.scene, args.cached_uv_unwrap, cam_f, light_f,
                   args.cam_nn_json, args.light_nn_json, args.imh,
                   args.uvs, args.spp, outdir))
            he.write(",".join(join(outdir, x) for x in expected) + "\n")
    print("Wrote %d jobs to:\n\t%s\n\t%s"
          % (len(tasks), params_f, expects_f))


if __name__ == "__main__":
    main(parser.parse_args())
