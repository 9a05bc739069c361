"""One-time smart UV unwrap of the scene object (Blender-only).

Re-implementation of the reference's unwrap step (reference:
data_gen/uv_unwrap.py:33-74 via xiuminglib blender/object.py:835-893):
runs Blender's smart UV projection (angle_limit=89, island_margin=0.001,
area_weight=1) on the object named 'object' and pickles the unwrap
table:

    dict[face_index] -> (K, 4+) rows of (loop_i, vert_i, u, v)

(the downstream mapping code only reads columns 2: — the UVs; reference:
data_gen/render.py:311-316).

Run under Blender's bundled Python:
    blender --background --python data_gen/uv_unwrap.py -- \
        --scene=<.blend> --outpath=<.pickle>
"""

import argparse
import pickle
import sys

import numpy as np

try:
    import bpy
except ImportError as e:
    raise ImportError(
        "uv_unwrap.py must run under Blender's bundled Python "
        "(blender --background --python ...)") from e


def parse_args():
    argv = sys.argv
    argv = argv[argv.index("--") + 1:] if "--" in argv else []
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", type=str, required=True)
    p.add_argument("--outpath", type=str, required=True)
    p.add_argument("--angle_limit", type=float, default=89.0)
    p.add_argument("--area_weight", type=float, default=1.0)
    return p.parse_args(argv)


def smart_uv_unwrap(obj, angle_limit=89.0, area_weight=1.0,
                    island_margin=0.001):
    """Smart UV projection + per-polygon loop UV harvest."""
    bpy.context.scene.objects.active = obj
    obj.select = True
    bpy.ops.object.mode_set(mode="EDIT")
    bpy.ops.mesh.select_all(action="SELECT")
    bpy.ops.uv.smart_project(
        angle_limit=angle_limit, island_margin=island_margin,
        user_area_weight=area_weight)
    bpy.ops.object.mode_set(mode="OBJECT")

    uv_layer = obj.data.uv_layers.active.data
    fi_li_vi_u_v = {}
    for poly in obj.data.polygons:
        rows = []
        for loop_i in poly.loop_indices:
            vert_i = obj.data.loops[loop_i].vertex_index
            uv = uv_layer[loop_i].uv
            rows.append((loop_i, vert_i, uv.x, uv.y))
        fi_li_vi_u_v[poly.index] = np.asarray(rows, np.float64)
    return fi_li_vi_u_v


def main(args):
    bpy.ops.wm.open_mainfile(filepath=args.scene)
    obj = bpy.data.objects["object"]
    table = smart_uv_unwrap(
        obj, angle_limit=args.angle_limit, area_weight=args.area_weight)
    with open(args.outpath, "wb") as h:
        pickle.dump(table, h)
    print("Unwrapped %d faces -> %s" % (len(table), args.outpath))


if __name__ == "__main__":
    main(parse_args())
