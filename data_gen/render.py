"""Per-(camera, light) ground-truth renderer (Blender-only shell).

Re-implementation of the reference's render job (reference:
data_gen/render.py:92-206) with the math factored into the
Blender-independent data_gen/render_math.py. One job:

1. open the .blend scene, replace cameras/lights with the given
   camera/point-light JSONs;
2. Cycles-render rgb_camspc.png (spp samples) and alpha.png;
3. backproject every pixel through a BVH raycast to (face, location,
   normal) hit records;
4. compute the bidirectional UV<->camera warp fields from the cached
   unwrap table (render_math.calc_bidir_mapping);
5. light cosines with shadow raycasts, view cosines;
6. remap rgb/cvis/lvis camera->UV through cam2uv;
7. dump cam/light/nn JSONs; optional --debug writes UV->camera->UV
   round-trip reprojections as a visual correctness check.

Run under Blender's bundled Python:
    blender --background --python data_gen/render.py -- \
        --scene=... --cached_uv_unwrap=... --cam_json=... \
        --light_json=... --cam_nn_json=... --light_nn_json=... \
        --imh=512 --uvs=512 --spp=256 --outdir=... [--debug]
"""

import argparse
import os
import pickle
import sys
from os.path import basename, exists, join
from shutil import copyfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from render_math import (  # noqa: E402
    calc_bidir_mapping, calc_light_cosines, calc_view_cosines)
from util import add_b_ch, dump_json, load_json, remap, \
    safe_cast_to_int, save_float16_npy  # noqa: E402

try:
    import bpy
    from mathutils import Vector
    from mathutils.bvhtree import BVHTree
except ImportError as e:
    raise ImportError(
        "render.py must run under Blender's bundled Python "
        "(blender --background --python ...). For a Blender-free data "
        "source, use data_gen/synthesize.py") from e


def parse_args():
    argv = sys.argv
    argv = argv[argv.index("--") + 1:] if "--" in argv else sys.argv[1:]
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", type=str, required=True)
    p.add_argument("--cached_uv_unwrap", type=str, required=True)
    p.add_argument("--cam_json", type=str, required=True)
    p.add_argument("--light_json", type=str, required=True)
    p.add_argument("--cam_nn_json", type=str, required=True)
    p.add_argument("--light_nn_json", type=str, required=True)
    p.add_argument("--imh", type=int, default=512)
    p.add_argument("--uvs", type=int, default=512)
    p.add_argument("--spp", type=int, default=256)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--debug", action="store_true")
    return p.parse_args(argv)


def add_camera(cam):
    bpy.ops.object.camera_add()
    cam_obj = bpy.context.active_object
    cam_obj.name = cam["name"]
    cam_obj.location = cam["position"]
    cam_obj.rotation_euler = cam["rotation"]
    cam_obj.data.lens = cam["focal_length"]
    cam_obj.data.sensor_width = cam["sensor_width"]
    cam_obj.data.sensor_height = cam["sensor_height"]
    cam_obj.data.clip_start = cam["clip_start"]
    cam_obj.data.clip_end = cam["clip_end"]
    bpy.context.scene.camera = cam_obj
    return cam_obj


def add_light_point(light):
    bpy.ops.object.lamp_add(type="POINT", location=light["position"])
    light_obj = bpy.context.active_object
    light_obj.name = light["name"]
    light_obj.data.shadow_soft_size = light.get("size", 0.1)
    return light_obj


def render_to(path, samples, alpha_only=False):
    scene = bpy.context.scene
    scene.cycles.samples = samples
    scene.render.filepath = path
    if alpha_only:
        scene.render.image_settings.color_mode = "RGBA"
        scene.render.alpha_mode = "TRANSPARENT"
    else:
        scene.render.image_settings.color_mode = "RGB"
    bpy.ops.render.render(write_still=True)


def backproject_pixels(cam_obj, obj, xys, imw, imh):
    """Per-pixel BVH raycast: hit mask, locations, normals, face ids
    (the xiuminglib backproject_to_3d analog; reference:
    xiuminglib/blender/camera.py:512-572)."""
    import bmesh
    bm = bmesh.new()
    bm.from_mesh(obj.data)
    bm.transform(obj.matrix_world)
    tree = BVHTree.FromBMesh(bm)

    cam = cam_obj.data
    cam_pos = cam_obj.location
    # Camera-to-world rotation
    rot = cam_obj.matrix_world.to_3x3()
    sensor_w = cam.sensor_width
    sensor_h = cam.sensor_height
    f = cam.lens

    n = xys.shape[0]
    hit_mask = np.zeros(n, bool)
    locs = np.zeros((n, 3))
    normals = np.zeros((n, 3))
    face_i = np.full(n, -1, np.int64)
    for i, (x, y) in enumerate(xys):
        # Pixel to camera-space direction (Blender camera looks -z).
        dx = (x + 0.5) / imw - 0.5
        dy = 0.5 - (y + 0.5) / imh
        d_cam = Vector((dx * sensor_w, dy * sensor_h, -f))
        d_world = (rot * d_cam).normalized()
        loc, normal, fi, _ = tree.ray_cast(cam_pos, d_world)
        if loc is not None:
            hit_mask[i] = True
            locs[i] = loc[:]
            normals[i] = normal[:]
            face_i[i] = fi
    return tree, hit_mask, locs, normals, face_i


def occlusion_from_light(tree, light_loc, hit_mask, locs, eps=1e-4):
    """True where the light->surface segment is blocked
    (reference: data_gen/render.py:231-252)."""
    light_loc = Vector(light_loc)
    occluded = np.zeros(hit_mask.shape[0], bool)
    for i in np.nonzero(hit_mask)[0]:
        target = Vector(locs[i])
        d = target - light_loc
        dist = d.length
        hit_loc, _, _, hit_dist = tree.ray_cast(
            light_loc, d.normalized())
        if hit_loc is not None and hit_dist < dist - eps:
            occluded[i] = True
    return occluded


def main(args):
    bpy.ops.wm.open_mainfile(filepath=args.scene)
    obj = bpy.data.objects["object"]

    # Remove existing cameras and lights.
    for o in list(bpy.data.objects):
        if o.type in ("LAMP", "LIGHT", "CAMERA"):
            bpy.data.objects.remove(o, do_unlink=True)

    cam = load_json(args.cam_json)
    light = load_json(args.light_json)
    cam_obj = add_camera(cam)
    add_light_point(light)

    imh = args.imh
    imw = safe_cast_to_int(
        imh / cam["sensor_height"] * cam["sensor_width"])
    scene = bpy.context.scene
    scene.render.resolution_x = imw
    scene.render.resolution_y = imh
    scene.render.resolution_percentage = 100

    os.makedirs(args.outdir, exist_ok=True)
    from PIL import Image

    rgb_f = join(args.outdir, "rgb_camspc.png")
    render_to(rgb_f, args.spp)
    rgb_camspc = np.asarray(
        Image.open(rgb_f).convert("RGB"), np.float32) / 255.0

    alpha_f = join(args.outdir, "alpha.png")
    render_to(alpha_f, args.spp, alpha_only=True)
    alpha = np.asarray(Image.open(alpha_f), np.float32) / 255.0
    if alpha.ndim == 3:
        alpha = alpha[:, :, -1]
        Image.fromarray(
            (alpha * 255).astype(np.uint8)).save(alpha_f)

    # Backproject all pixels.
    xs, ys = np.meshgrid(range(imw), range(imh))
    xys = np.dstack((xs, ys)).reshape(-1, 2)
    tree, hit_mask, locs, normals, face_i = backproject_pixels(
        cam_obj, obj, xys, imw, imh)

    # Bidirectional warp fields from the cached unwrap.
    with open(args.cached_uv_unwrap, "rb") as h:
        table = pickle.load(h)
    face_uvs = {fi: rows[:, 2:] for fi, rows in table.items()}
    uv2cam, cam2uv = calc_bidir_mapping(
        face_uvs, xys, hit_mask, face_i, imh, imw, args.uvs)
    uv2cam[alpha < 1] = 0  # mask out-of-object interpolations
    Image.fromarray((np.clip(add_b_ch(uv2cam), 0, 1) * 255).astype(
        np.uint8)).save(join(args.outdir, "uv2cam.png"))
    Image.fromarray((np.clip(add_b_ch(cam2uv), 0, 1) * 255).astype(
        np.uint8)).save(join(args.outdir, "cam2uv.png"))
    save_float16_npy(uv2cam[:, :, :2], join(args.outdir, "uv2cam.npy"))
    save_float16_npy(cam2uv[:, :, :2], join(args.outdir, "cam2uv.npy"))

    # Cosine buffers (camera space), then remap to UV.
    occluded = occlusion_from_light(
        tree, light["position"], hit_mask, locs)
    lvis_camspc = np.clip(calc_light_cosines(
        light["position"], xys, hit_mask, locs, normals, occluded,
        imh, imw), 0, 1)
    cvis_camspc = np.clip(calc_view_cosines(
        cam["position"], xys, hit_mask, locs, normals, imh, imw), 0, 1)

    def w01(name, arr):
        Image.fromarray(
            (np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(
            join(args.outdir, name))

    w01("lvis_camspc.png", lvis_camspc)
    w01("cvis_camspc.png", cvis_camspc)
    w01("cvis.png", remap(cvis_camspc, cam2uv))
    w01("lvis.png", remap(lvis_camspc, cam2uv))
    w01("rgb.png", remap(rgb_camspc, cam2uv))

    if args.debug:
        # UV -> camera -> UV round trip as a visual correctness check
        # (reference: data_gen/render.py:180-194).
        for name in ("cvis", "lvis", "rgb"):
            uv_img = np.asarray(Image.open(
                join(args.outdir, name + ".png")), np.float32) / 255.0
            w01(name + "_camspc_repro.png", remap(uv_img, uv2cam))

    copyfile(args.cam_json, join(args.outdir, "cam.json"))
    copyfile(args.light_json, join(args.outdir, "light.json"))
    cam_nn = load_json(args.cam_nn_json)
    light_nn = load_json(args.light_nn_json)
    cam_name = basename(args.cam_json)[:-len(".json")]
    light_name = basename(args.light_json)[:-len(".json")]
    nn = {"cam": cam_nn[cam_name], "light": light_nn[light_name]}
    # Optional k-nearest lists (get_neighbors.py --k): enables
    # multi-observation training (datasets/nlt.py n_obs > 1).
    cam_k_path = args.cam_nn_json[:-len(".json")] + "_k.json"
    light_k_path = args.light_nn_json[:-len(".json")] + "_k.json"
    if exists(cam_k_path) and exists(light_k_path):
        nn["cams"] = load_json(cam_k_path)[cam_name]
        nn["lights"] = load_json(light_k_path)[light_name]
    dump_json(nn, join(args.outdir, "nn.json"))
    print("Rendered ->", args.outdir)


if __name__ == "__main__":
    main(parse_args())
