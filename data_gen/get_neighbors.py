"""Find the nearest physical camera/light for every camera/light.

Re-implementation of the reference's neighbor finder (reference:
data_gen/get_neighbors.py:52-102): Euclidean distance on 'position',
excluding self; outputs neighbors/cams.json and neighbors/lights.json
mapping every (physical or virtual) name to its nearest *physical* name.

Run:  python data_gen/get_neighbors.py --cam_dir=... --light_dir=...
          --test_cam_dir=... --test_light_dir=... --outdir=...
"""

import argparse
import os
from glob import glob

import numpy as np

from util import load_json, dump_json  # noqa: local import when run as CLI

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--cam_dir", type=str, required=True,
                    help="directory of physical (trainvali) camera JSONs")
parser.add_argument("--light_dir", type=str, required=True,
                    help="directory of physical (trainvali) light JSONs")
parser.add_argument("--test_cam_dir", type=str, default=None,
                    help="directory of virtual (test) camera JSONs")
parser.add_argument("--test_light_dir", type=str, default=None,
                    help="directory of virtual (test) light JSONs")
parser.add_argument("--outdir", type=str, required=True)


def _load_positions(dir_):
    pos = {}
    if dir_ is None:
        return pos
    for f in sorted(glob(os.path.join(dir_, "*.json"))):
        data = load_json(f)
        name = data.get("name", os.path.basename(f)[:-len(".json")])
        pos[name] = np.asarray(data["position"], np.float64)
    return pos


def get_neighbors(physical, queries=None):
    """For each query name, the nearest physical name (excluding an
    identical name)."""
    if queries is None:
        queries = physical
    names = list(physical.keys())
    mat = np.stack([physical[n] for n in names])
    nn = {}
    for qname, qpos in queries.items():
        d = np.linalg.norm(mat - qpos[None], axis=1)
        for i in np.argsort(d):
            if names[i] != qname:
                nn[qname] = names[i]
                break
    return nn


def main(args):
    cams = _load_positions(args.cam_dir)
    lights = _load_positions(args.light_dir)
    test_cams = _load_positions(args.test_cam_dir)
    test_lights = _load_positions(args.test_light_dir)

    cam_nn = get_neighbors(cams)
    cam_nn.update(get_neighbors(cams, test_cams))
    light_nn = get_neighbors(lights)
    light_nn.update(get_neighbors(lights, test_lights))

    dump_json(cam_nn, os.path.join(args.outdir, "cams.json"))
    dump_json(light_nn, os.path.join(args.outdir, "lights.json"))
    print("Wrote neighbors to %s" % args.outdir)


if __name__ == "__main__":
    main(parser.parse_args())
