"""A minimal in-process stand-in for the Blender Python API, enough to
drive data_gen/render.py end to end without Blender.

Geometry is an analytic unit sphere at the origin: BVHTree.ray_cast
solves the ray-sphere intersection exactly, faces are cells of a
lat-long grid (so the uv_unwrap pickle contract — face index -> rows
of (loop_i, vert_i, u, v) — has a closed form), and `Cycles` renders
Lambert shading from the scene's point light. This validates the
render shell's control flow, buffer plumbing, and on-disk contract
(SURVEY §2.2's one remaining 'partial'); real Cycles output quality is
still Blender-only.

Usage (before importing render):
    import tests.fake_bpy as fake_bpy
    fake_bpy.install()
    import render  # data_gen/render.py
"""

import sys
import types

import numpy as np

SPHERE_R = 1.0
N_TH = 24   # latitude cells (theta in [0, pi])
N_PH = 24   # longitude cells


# ---------------------------------------------------------------------
# mathutils stand-ins
# ---------------------------------------------------------------------

class Vector:
    def __init__(self, seq):
        self._a = np.asarray(
            [float(x) for x in seq], np.float64)

    def __sub__(self, other):
        return Vector(self._a - np.asarray(other))

    def __array__(self, dtype=None):
        return self._a.astype(dtype) if dtype else self._a

    def __getitem__(self, i):
        return self._a[i]

    def __iter__(self):
        return iter(self._a)

    def __len__(self):
        return 3

    @property
    def length(self):
        return float(np.linalg.norm(self._a))

    def normalized(self):
        n = np.linalg.norm(self._a)
        return Vector(self._a / (n if n else 1.0))


class Matrix3:
    def __init__(self, m=None):
        self.m = np.eye(3) if m is None else np.asarray(m, np.float64)

    def to_3x3(self):
        return self

    def __mul__(self, v):  # Blender 2.7x operator
        return Vector(self.m @ np.asarray(v))


def _euler_to_matrix(euler):
    """Blender XYZ euler -> rotation matrix."""
    ex, ey, ez = [float(a) for a in euler]
    cx, sx = np.cos(ex), np.sin(ex)
    cy, sy = np.cos(ey), np.sin(ey)
    cz, sz = np.cos(ez), np.sin(ez)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


# ---------------------------------------------------------------------
# sphere "BVH"
# ---------------------------------------------------------------------

def sphere_face_index(p):
    """Lat-long cell index of a point on the sphere."""
    x, y, z = np.asarray(p, np.float64) / SPHERE_R
    theta = np.arccos(np.clip(z, -1, 1))            # [0, pi]
    phi = np.arctan2(y, x)                          # [-pi, pi]
    ith = min(int(theta / np.pi * N_TH), N_TH - 1)
    iph = min(int((phi + np.pi) / (2 * np.pi) * N_PH), N_PH - 1)
    return ith * N_PH + iph


def face_uv_corners(fi):
    """The 4 (u, v) corners of lat-long cell fi; u = longitude
    fraction, v = 1 - latitude fraction (v up, unwrap contract)."""
    ith, iph = divmod(fi, N_PH)
    u0, u1 = iph / N_PH, (iph + 1) / N_PH
    v0, v1 = 1 - ith / N_TH, 1 - (ith + 1) / N_TH
    return np.array(
        [[u0, v0], [u1, v0], [u1, v1], [u0, v1]], np.float64)


def unwrap_table():
    """uv_unwrap.py pickle contract: face -> rows (loop_i, vert_i, u, v)."""
    table = {}
    for fi in range(N_TH * N_PH):
        uv = face_uv_corners(fi)
        rows = np.hstack([
            np.arange(4, dtype=np.float64)[:, None],
            np.arange(4, dtype=np.float64)[:, None], uv])
        table[fi] = rows
    return table


class FakeBVHTree:
    @staticmethod
    def FromBMesh(_bm):
        return FakeBVHTree()

    def ray_cast(self, origin, direction):
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d)
        # |o + t d|^2 = r^2
        b = 2 * float(o @ d)
        c = float(o @ o) - SPHERE_R ** 2
        disc = b * b - 4 * c
        if disc < 0:
            return None, None, None, None
        sq = np.sqrt(disc)
        for t in ((-b - sq) / 2, (-b + sq) / 2):
            if t > 1e-9:
                loc = o + t * d
                normal = loc / np.linalg.norm(loc)
                return (Vector(loc), Vector(normal),
                        sphere_face_index(loc), float(t))
        return None, None, None, None


# ---------------------------------------------------------------------
# bpy scene graph
# ---------------------------------------------------------------------

class _Attr(dict):
    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


class FakeObject:
    def __init__(self, name, otype):
        self.name = name
        self.type = otype
        self.location = Vector((0, 0, 0))
        self.rotation_euler = (0.0, 0.0, 0.0)
        self.data = _Attr()
        self.data["shadow_soft_size"] = 0.1

    @property
    def matrix_world(self):
        return Matrix3(_euler_to_matrix(self.rotation_euler))


class _State:
    def __init__(self):
        self.objects = []
        self.active = None
        self.scene = _Attr(
            camera=None,
            cycles=_Attr(samples=0),
            render=_Attr(
                filepath="", resolution_x=0, resolution_y=0,
                resolution_percentage=100, alpha_mode="",
                image_settings=_Attr(color_mode="RGB")))


STATE = _State()


def _render_write(path, alpha_only):
    """Analytic 'Cycles': raycast every pixel, Lambert-shade from the
    scene's point light, write the PNG render.py will read back."""
    from PIL import Image

    sc = STATE.scene
    imw, imh = sc.render.resolution_x, sc.render.resolution_y
    cam = sc.camera
    lights = [o for o in STATE.objects if o.type == "LAMP"]
    light_pos = np.asarray(lights[0].location) if lights else np.zeros(3)
    tree = FakeBVHTree()
    rot = _euler_to_matrix(cam.rotation_euler)
    cam_pos = np.asarray(cam.location)
    f = cam.data["lens"]
    sw, sh = cam.data["sensor_width"], cam.data["sensor_height"]

    rgb = np.zeros((imh, imw, 3), np.float64)
    alpha = np.zeros((imh, imw), np.float64)
    for y in range(imh):
        for x in range(imw):
            dx = (x + 0.5) / imw - 0.5
            dy = 0.5 - (y + 0.5) / imh
            d = rot @ np.array([dx * sw, dy * sh, -f])
            loc, normal, _, _ = tree.ray_cast(cam_pos, d)
            if loc is None:
                continue
            alpha[y, x] = 1.0
            n = np.asarray(normal)
            l = light_pos - np.asarray(loc)
            l = l / np.linalg.norm(l)
            lam = max(0.0, float(n @ l))
            rgb[y, x] = 0.15 + 0.8 * lam  # ambient + diffuse, gray

    if alpha_only:
        rgba = np.dstack([rgb, alpha])
        Image.fromarray(
            (np.clip(rgba, 0, 1) * 255).astype(np.uint8),
            "RGBA").save(path)
    else:
        Image.fromarray(
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(path)


def install():
    """Register fake bpy/mathutils/bmesh modules in sys.modules."""
    global STATE
    STATE = _State()

    bpy = types.ModuleType("bpy")
    mathutils = types.ModuleType("mathutils")
    bvhtree = types.ModuleType("mathutils.bvhtree")
    bmesh = types.ModuleType("bmesh")

    mathutils.Vector = Vector
    bvhtree.BVHTree = FakeBVHTree
    mathutils.bvhtree = bvhtree

    class _BM:
        def from_mesh(self, _data):
            pass

        def transform(self, _m):
            pass

    bmesh.new = lambda: _BM()

    # bpy.data.objects
    class _Objects(list):
        def __getitem__(self, key):
            if isinstance(key, str):
                for o in self:
                    if o.name == key:
                        return o
                raise KeyError(key)
            return list.__getitem__(self, key)

        def remove(self, obj, do_unlink=False):
            list.remove(self, obj)

    objects = _Objects()
    mesh = FakeObject("object", "MESH")
    objects.append(mesh)
    STATE.objects = objects

    bpy.data = _Attr(objects=objects)

    class _Context:
        @property
        def scene(self):
            return STATE.scene

        @property
        def active_object(self):
            return STATE.active

    bpy.context = _Context()

    # ops
    ops = types.SimpleNamespace()

    def open_mainfile(filepath):
        assert filepath  # scene path is part of the CLI contract

    def camera_add():
        o = FakeObject("Camera", "CAMERA")
        o.data.update(lens=35.0, sensor_width=32.0, sensor_height=32.0,
                      clip_start=0.1, clip_end=100.0)
        objects.append(o)
        STATE.active = o

    def lamp_add(type="POINT", location=(0, 0, 0)):
        o = FakeObject("Lamp", "LAMP")
        o.location = Vector(location)
        objects.append(o)
        STATE.active = o

    def render_fn(write_still=False):
        sc = STATE.scene
        _render_write(
            sc.render.filepath,
            alpha_only=sc.render.image_settings.color_mode == "RGBA")

    ops.wm = types.SimpleNamespace(
        open_mainfile=lambda filepath: open_mainfile(filepath))
    ops.object = types.SimpleNamespace(
        camera_add=camera_add, lamp_add=lamp_add)
    ops.render = types.SimpleNamespace(render=render_fn)
    bpy.ops = ops

    sys.modules["bpy"] = bpy
    sys.modules["mathutils"] = mathutils
    sys.modules["mathutils.bvhtree"] = bvhtree
    sys.modules["bmesh"] = bmesh
    return bpy
