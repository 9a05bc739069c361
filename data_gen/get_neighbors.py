"""Find the nearest physical camera/light for every camera/light.

Re-implementation of the reference's neighbor finder (reference:
data_gen/get_neighbors.py:52-102): Euclidean distance on 'position',
excluding self; outputs neighbors/cams.json and neighbors/lights.json
mapping every (physical or virtual) name to its nearest *physical* name.

Extension over the reference: --k > 1 additionally writes
cams_k.json / lights_k.json mapping every name to its k nearest
physical names (ordered), consumed by render.py to embed a "cams"/
"lights" list in each config's nn.json for multi-observation training
(datasets/nlt.py n_obs).

Run:  python data_gen/get_neighbors.py --cam_dir=... --light_dir=...
          --test_cam_dir=... --test_light_dir=... --outdir=... [--k=4]
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
parser.add_argument("--k", type=int, default=1,
                    help="also write the k-nearest lists when > 1")


def _load_positions(dir_):
    pos = {}
    if dir_ is None:
        return pos
    for f in sorted(glob(os.path.join(dir_, "*.json"))):
        data = load_json(f)
        name = data.get("name", os.path.basename(f)[:-len(".json")])
        pos[name] = np.asarray(data["position"], np.float64)
    return pos


def get_neighbors(physical, queries=None, k=1):
    """For each query name, the k nearest physical names (excluding an
    identical name) — a single name when k == 1 (the reference
    contract), else an ordered list."""
    if queries is None:
        queries = physical
    names = list(physical.keys())
    mat = np.stack([physical[n] for n in names])
    nn = {}
    for qname, qpos in queries.items():
        d = np.linalg.norm(mat - qpos[None], axis=1)
        nearest = [names[i] for i in np.argsort(d) if names[i] != qname]
        if not nearest:
            continue  # no non-self neighbor: omit, like the reference
        nn[qname] = nearest[0] if k == 1 else nearest[:k]
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
    if args.k > 1:
        cam_k = get_neighbors(cams, k=args.k)
        cam_k.update(get_neighbors(cams, test_cams, k=args.k))
        light_k = get_neighbors(lights, k=args.k)
        light_k.update(get_neighbors(lights, test_lights, k=args.k))
        dump_json(cam_k, os.path.join(args.outdir, "cams_k.json"))
        dump_json(light_k, os.path.join(args.outdir, "lights_k.json"))
    print("Wrote neighbors to %s" % args.outdir)


if __name__ == "__main__":
    main(parser.parse_args())
