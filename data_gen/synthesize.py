"""Synthetic scene generator: an analytic ray-traced sphere that emits
the exact NLT on-disk data contract without Blender.

The reference's data generation needs Blender 2.78c + Cycles on a render
farm (reference: data_gen/render.py, data_gen/README.md:69-140). This
generator replaces that offline dependency for development, testing, and
benchmarking: a vectorized numpy ray tracer renders a textured sphere
with Blinn-Phong specular (or wrap-lighting "sss") under point lights,
and writes, per (cam, light) config, the same buffers render.py would
(reference contract: SURVEY.md §2.2; data_gen/postproc.py:96-108):

    cam.json light.json nn.json rgb.png rgb_camspc.png alpha.png
    cvis.png lvis.png uv2cam.npy cam2uv.npy

then runs the real postproc (albedo -> diffuse bases -> file-list JSON),
so the full downstream pipeline (datasets/nlt.py, trainvali) runs
unchanged.

Conventions matched:
- uv2cam.npy: camera-resolution float16 field of normalized UV source
  coordinates per camera pixel; background pixels are 0 so resampling
  reads the blacked-out corner texel (reference: render.py:151-158,
  data_gen/util.py:45-58);
- cam2uv.npy: UV-resolution field of normalized camera source coords;
- IDs '{trainvali|test}_{i:09d}_{cam}_{light}'; trainvali is the
  cam x light product, test pairs virtual cams/lights 1:1 (reference:
  gen_render_params_expects.py:112-121);
- nn.json = nearest physical cam/light by Euclidean distance
  (reference: get_neighbors.py:52-71).

Run:
    python data_gen/synthesize.py --outroot=/tmp/scene_sphere \
        --n_cams=4 --n_lights=4 --imh=128 --uvs=128 [--sss]
"""

import argparse
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from util import (add_b_ch, dump_json, remap, save_float16_npy,  # noqa: E402
                  splat_unstruct)

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--outroot", type=str, required=True)
parser.add_argument("--n_cams", type=int, default=4)
parser.add_argument("--n_lights", type=int, default=4)
parser.add_argument("--n_test", type=int, default=4,
                    help="number of 1:1-paired virtual (cam, light) configs")
parser.add_argument("--imh", type=int, default=128)
parser.add_argument("--uvs", type=int, default=128)
parser.add_argument("--sss", action="store_true",
                    help="wrap-lighting 'subsurface' shading instead of "
                         "specular Blinn-Phong")
parser.add_argument("--material_blobs", action="store_true",
                    help="hidden spatially-varying specular material "
                         "(random smooth roughness/intensity blobs, "
                         "independent of the albedo): the residual is "
                         "then NOT predictable from the diffuse base "
                         "alone, so the observation path carries real "
                         "signal (use_obs / n_obs A/Bs)")
parser.add_argument("--identity_uv", action="store_true",
                    help="fixed-view relighting setup: treat camera-space "
                         "images as UV-unwrapped ones with an identity "
                         "warp (the reference README's sanctioned "
                         "simplification, README.md:37-43); combine with "
                         "--n_cams=1")
parser.add_argument("--shape", type=str, default="sphere",
                    choices=["sphere", "torus"],
                    help="'sphere': analytic single-chart lat-long UV "
                         "unwrap, direct warp evaluation (benign). "
                         "'torus': the dragon-data REGIME — a self-"
                         "occluding surface (cast shadows, near-tube-"
                         "occludes-far-tube), a MULTI-ISLAND UV atlas "
                         "(4 differently-oriented charts + a tube "
                         "seam), and warp fields built the reference "
                         "way: nearest-splat with an L1 trust radius "
                         "of 4 (seams, holes, and occlusion "
                         "discontinuities are real; reference: "
                         "data_gen/render.py:279-351, "
                         "xiuminglib/blender/object.py:835-893)")
parser.add_argument("--seed", type=int, default=0)

SPHERE_R = 1.0
CAM_R = 3.5
LIGHT_R = 4.0
FOV_DEG = 40.0

# Torus (z-axis): bounding radius TORUS_R + TORUS_r ~ the sphere's.
TORUS_R = 0.72
TORUS_r = 0.34
ATLAS_PAD = 0.05  # per-cell margin of the 2x2 island packing


def normalize(v, axis=-1):
    return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True),
                          1e-12)


def look_at(cam_pos, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """Returns camera axes (right, down, forward) — y grows downward in
    image space."""
    fwd = normalize(np.asarray(target, np.float64) - cam_pos)
    right = normalize(np.cross(fwd, np.asarray(up, np.float64)))
    down = np.cross(fwd, right)
    return right, down, fwd


def sphere_uv(p):
    """Spherical UV mapping of unit-sphere points: u from azimuth,
    v from polar angle; both in [0, 1)."""
    u = 0.5 + np.arctan2(p[..., 1], p[..., 0]) / (2 * np.pi)
    v = np.arccos(np.clip(p[..., 2] / SPHERE_R, -1, 1)) / np.pi
    return u, v


def uv_to_point(u, v):
    phi = (u - 0.5) * 2 * np.pi
    theta = v * np.pi
    st = np.sin(theta)
    return np.stack([
        st * np.cos(phi), st * np.sin(phi), np.cos(theta)], axis=-1) \
        * SPHERE_R


def albedo_texture(u, v):
    """Procedural checker + gradient albedo in [0.1, 0.95]."""
    checker = ((np.floor(u * 8) + np.floor(v * 8)) % 2)
    r = 0.25 + 0.6 * checker
    g = 0.2 + 0.55 * v
    b = 0.3 + 0.5 * (1 - checker) * u
    return np.clip(np.stack([r, g, b], axis=-1), 0.05, 0.95)


# Hidden material map: a fixed sum of smooth bumps over (u, v)
# (u periodic), INDEPENDENT of the albedo texture, so nothing in the
# query inputs (base, cvis, lvis) reveals it — only neighbor
# observations do. Deterministic (fixed seed) per scene.
_MATERIAL_BLOBS = False


_MATERIAL_NORM = None  # fixed global peak (set on first use)


def _material_raw(u, v, k=8):
    rng = np.random.RandomState(1234)
    cu = rng.uniform(0, 1, k)
    cv = rng.uniform(0.1, 0.9, k)
    w = rng.uniform(0.05, 0.15, k)
    amp = rng.uniform(0.5, 1.0, k)
    m = np.zeros(np.shape(u), np.float64)
    for i in range(k):
        du = np.abs(u - cu[i])
        du = np.minimum(du, 1 - du)  # periodic longitude
        dv = v - cv[i]
        m = m + amp[i] * np.exp(-(du ** 2 + dv ** 2) / (2 * w[i] ** 2))
    return m


def material_map(u, v):
    """Normalized by a FIXED global peak (dense-grid evaluation, once):
    a per-call max would rescale the 'fixed' material differently for
    the camera-space and UV-space shading passes of the same render,
    making the supervision pair physically inconsistent."""
    global _MATERIAL_NORM
    if _MATERIAL_NORM is None:
        gu, gv = np.meshgrid(np.linspace(0, 1, 512),
                             np.linspace(0, 1, 512))
        _MATERIAL_NORM = float(_material_raw(gu, gv).max())
    return np.clip(_material_raw(u, v) / _MATERIAL_NORM, 0, 1)


def shade(p, n, cam_pos, light_pos, sss=False, uv=None, shadow=None):
    """Full light transport at surface points p with normals n.

    uv: optional (u, v) surface-intrinsic texture coordinates (defaults
    to the sphere's lat-long mapping). shadow: optional 0/1 cast-shadow
    visibility (1 = lit); modulates all direct lighting, making lvis
    the shadowed light-visibility buffer like the reference's
    shadow-raycast lvis (reference: data_gen/render.py:231-276).

    Returns (rgb, lvis, cvis): rgb in [0,1], lvis = clamped (shadowed)
    light cosine, cvis = clamped view cosine."""
    l_dir = normalize(light_pos - p)
    v_dir = normalize(cam_pos - p)
    ndl = np.sum(n * l_dir, axis=-1)
    ndv = np.sum(n * v_dir, axis=-1)
    shadow = 1.0 if shadow is None else shadow
    lvis = np.clip(ndl, 0, 1) * shadow
    cvis = np.clip(ndv, 0, 1)

    u, v = uv if uv is not None else sphere_uv(p)
    alb = albedo_texture(u, v)
    if sss:
        # Wrap lighting: light leaks past the terminator; cast shadows
        # soften the direct term but not the tint (subsurface scatter).
        w = 0.4
        wrap = np.clip((ndl + w) / (1 + w), 0, 1) \
            * (0.3 + 0.7 * shadow)
        rgb = alb * wrap[..., None]
        # A reddish subsurface tint near the terminator.
        ring = np.clip(1 - np.abs(ndl) / 0.3, 0, 1)
        rgb = rgb + np.stack(
            [0.25 * ring, 0.05 * ring, 0.02 * ring], axis=-1)
    else:
        diff = alb * lvis[..., None]
        h = normalize(l_dir + v_dir)
        ndh = np.clip(np.sum(n * h, axis=-1), 0, 1)
        if _MATERIAL_BLOBS:
            m = material_map(u, v)
            # Roughness/intensity vary with the hidden map: shiny
            # narrow highlights in the blobs, broad dull ones outside.
            expo = 8.0 + 120.0 * m
            spec = (0.15 + 0.85 * m) * (ndh ** expo) * (lvis > 0)
        else:
            spec = 0.6 * (ndh ** 64) * (lvis > 0)
        rgb = diff + spec[..., None]
    return np.clip(rgb, 0, 1), lvis, cvis


def render_config(cam, light, imh, uvs, sss):
    """Render every buffer for one (cam, light) pair."""
    cam_pos = np.asarray(cam["position"], np.float64)
    light_pos = np.asarray(light["position"], np.float64)
    right, down, fwd = look_at(cam_pos)
    focal = 0.5 / np.tan(np.deg2rad(FOV_DEG) / 2)

    # ---- camera-space pass: ray-trace each pixel ----
    ys, xs = np.meshgrid(np.arange(imh), np.arange(imh), indexing="ij")
    # NDC in [-0.5, 0.5]
    ndc_x = (xs + 0.5) / imh - 0.5
    ndc_y = (ys + 0.5) / imh - 0.5
    # Pinhole: d = normalize(focal*fwd + x*right + y*down)
    dirs = normalize(
        focal * fwd[None, None] + ndc_x[..., None] * right[None, None]
        + ndc_y[..., None] * down[None, None])

    # Ray-sphere intersection: |o + t d|^2 = R^2
    oc = cam_pos[None, None]
    b = np.sum(dirs * oc, axis=-1)
    c = np.sum(cam_pos * cam_pos) - SPHERE_R ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    p = oc + t[..., None] * dirs
    n = normalize(p)

    rgb_camspc, _, _ = shade(p, n, cam_pos, light_pos, sss)
    rgb_camspc *= hit[..., None]
    alpha = hit.astype(np.float32)

    # uv2cam: normalized UV source coordinates per camera pixel.
    u, v = sphere_uv(p)
    uv2cam = np.stack([u, v], axis=-1).astype(np.float32)
    uv2cam[~hit] = 0.0

    # ---- UV-space pass: shade each texel directly ----
    vv, uu = np.meshgrid(
        (np.arange(uvs) + 0.5) / uvs, (np.arange(uvs) + 0.5) / uvs,
        indexing="ij")
    p_uv = uv_to_point(uu, vv)
    n_uv = normalize(p_uv)
    rgb_uv, lvis_uv, cvis_uv = shade(p_uv, n_uv, cam_pos, light_pos, sss)

    # cam2uv: normalized camera source coordinates per UV texel (0 where
    # the texel isn't visible from this camera).
    rel = p_uv - cam_pos
    depth = rel @ fwd
    px = (rel @ right) / depth * focal + 0.5   # back to [0,1]
    py = (rel @ down) / depth * focal + 0.5
    visible = (np.sum(n_uv * normalize(cam_pos - p_uv), axis=-1) > 0) \
        & (px > 0) & (px < 1) & (py > 0) & (py < 1) & (depth > 0)
    cam2uv = np.stack([px, py], axis=-1).astype(np.float32)
    cam2uv[~visible] = 0.0
    # Hide lighting on texels invisible from the camera only in cvis
    # (rgb/lvis stay defined everywhere in UV space, like the
    # reference's remapped buffers are only defined where visible; we
    # keep them dense, which is strictly more information).

    return {
        "rgb_camspc": rgb_camspc.astype(np.float32),
        "alpha": alpha,
        "uv2cam": uv2cam,
        "rgb": rgb_uv.astype(np.float32),
        "lvis": lvis_uv.astype(np.float32),
        "cvis": cvis_uv.astype(np.float32),
        "cam2uv": cam2uv,
    }


# ---- torus: the dragon-data regime ---------------------------------
#
# A z-axis torus self-occludes (the near tube hides the far tube; the
# hole shows background through the middle) and casts shadows on
# itself. Its UV atlas is FOUR differently-oriented islands (theta
# quadrants packed 2x2 with margins, one transposed, one u-flipped,
# one v-flipped — the arbitrary-orientation structure Blender's smart
# UV projection produces; reference:
# xiuminglib/blender/object.py:835-893) plus a tube seam (phi wrap)
# crossing every island. Warp fields are built from the camera pass's
# scattered correspondences by nearest-splat with an L1 trust radius
# (util.splat_unstruct), and UV-space buffers are REMAPPED from camera
# space through cam2uv — exactly the reference pipeline, so seams,
# trust-radius holes, and occlusion discontinuities are real
# (reference: data_gen/render.py:151-179, 279-351).


def torus_sdf(p):
    s = np.hypot(p[..., 0], p[..., 1])
    return np.hypot(s - TORUS_R, p[..., 2]) - TORUS_r


def torus_normal(p):
    """Analytic SDF gradient (exact on the surface)."""
    s = np.maximum(np.hypot(p[..., 0], p[..., 1]), 1e-12)
    q0 = s - TORUS_R
    qn = np.maximum(np.hypot(q0, p[..., 2]), 1e-12)
    gx = (q0 / qn) * (p[..., 0] / s)
    gy = (q0 / qn) * (p[..., 1] / s)
    gz = p[..., 2] / qn
    return normalize(np.stack([gx, gy, gz], axis=-1))


def torus_params(p):
    """Surface-intrinsic angles: theta around the main axis, phi around
    the tube; both in [0, 1)."""
    theta = np.arctan2(p[..., 1], p[..., 0])  # [-pi, pi)
    s = np.hypot(p[..., 0], p[..., 1])
    phi = np.arctan2(p[..., 2], s - TORUS_R)
    return (theta / (2 * np.pi)) % 1.0, (phi / (2 * np.pi)) % 1.0


def torus_point(th01, ph01):
    theta = th01 * 2 * np.pi
    phi = ph01 * 2 * np.pi
    ring = TORUS_R + TORUS_r * np.cos(phi)
    return np.stack([ring * np.cos(theta), ring * np.sin(theta),
                     TORUS_r * np.sin(phi)], axis=-1)


def surf_to_atlas(th01, ph01):
    """Multi-island UV atlas: 4 theta-quadrant islands packed 2x2 with
    per-cell margins and per-island orientation changes. Adjacent
    surface points across a quadrant boundary land in DIFFERENT,
    differently-oriented atlas cells — the warp-discontinuity structure
    of smart-UV unwraps."""
    island = np.minimum((th01 * 4).astype(np.int64), 3)
    a = th01 * 4 - island  # [0, 1) along the quadrant
    b = ph01               # [0, 1) around the tube (seam at phi=0)
    # Orientation per island: 0 identity, 1 transposed, 2 u-flip,
    # 3 v-flip.
    a2 = np.select([island == 1, island == 2], [b, 1 - a], a)
    b2 = np.select([island == 1, island == 3], [a, 1 - b], b)
    row, col = island // 2, island % 2
    u = (col + ATLAS_PAD + a2 * (1 - 2 * ATLAS_PAD)) / 2
    v = (row + ATLAS_PAD + b2 * (1 - 2 * ATLAS_PAD)) / 2
    return u, v


def march(origins, dirs, n_steps=160, eps=2e-4, tmax=12.0, t0=0.0):
    """Vectorized sphere tracing against the torus SDF. Returns
    (hit, t): hit mask and ray parameter of the surface point."""
    t = np.broadcast_to(np.asarray(t0, np.float64),
                        dirs.shape[:-1]).copy()
    done = np.zeros(dirs.shape[:-1], bool)
    for _ in range(n_steps):
        p = origins + t[..., None] * dirs
        d = torus_sdf(p)
        done |= d < eps
        t = np.where(done, t, t + d)
        if bool(np.all(done | (t > tmax))):
            break
    return done & (t <= tmax), t


def light_shadow(p, n, light_pos):
    """Cast-shadow visibility by shadow-ray marching from each surface
    point toward the light (the reference raycasts light->surface;
    reference: data_gen/render.py:231-276). 1 = lit, 0 = shadowed."""
    to_l = light_pos - p
    dist_l = np.linalg.norm(to_l, axis=-1)
    l_dir = to_l / np.maximum(dist_l[..., None], 1e-12)
    # Start just off the surface; a hit before the light = shadowed.
    start = p + n * 3e-3
    hit, t = march(start, l_dir, n_steps=128, eps=2e-4,
                   tmax=float(dist_l.max()))
    return (~(hit & (t < dist_l - 1e-2))).astype(np.float64)


def render_config_torus(cam, light, imh, uvs, sss):
    """Render one (cam, light) pair of the torus scene the reference
    pipeline's way: camera-space pass by ray marching, warps by
    trust-radius nearest-splat of the per-pixel correspondences, and
    UV-space buffers remapped from camera space through cam2uv."""
    cam_pos = np.asarray(cam["position"], np.float64)
    light_pos = np.asarray(light["position"], np.float64)
    right, down, fwd = look_at(cam_pos)
    focal = 0.5 / np.tan(np.deg2rad(FOV_DEG) / 2)

    # ---- camera-space pass ----
    ys, xs = np.meshgrid(np.arange(imh), np.arange(imh), indexing="ij")
    ndc_x = (xs + 0.5) / imh - 0.5
    ndc_y = (ys + 0.5) / imh - 0.5
    dirs = normalize(
        focal * fwd[None, None] + ndc_x[..., None] * right[None, None]
        + ndc_y[..., None] * down[None, None])
    # Start marching at the bounding sphere to save iterations.
    oc = cam_pos[None, None]
    brad = TORUS_R + TORUS_r + 0.05
    b = np.sum(dirs * oc, axis=-1)
    c = np.sum(cam_pos * cam_pos) - brad ** 2
    disc = b * b - c
    near = np.where(disc > 0, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
    hit, t = march(np.broadcast_to(oc, dirs.shape), dirs,
                   t0=np.where(np.isfinite(near), near, 0.0))
    hit &= np.isfinite(near)
    p = oc + t[..., None] * dirs
    n = torus_normal(p)

    shadow = light_shadow(p, n, light_pos)
    th01, ph01 = torus_params(p)
    rgb_camspc, lvis_cam, cvis_cam = shade(
        p, n, cam_pos, light_pos, sss, uv=(th01, ph01), shadow=shadow)
    rgb_camspc *= hit[..., None]
    lvis_cam = lvis_cam * hit
    cvis_cam = cvis_cam * hit
    alpha = hit.astype(np.float32)

    # ---- warps by trust-radius nearest-splat (the reference way) ----
    u_at, v_at = surf_to_atlas(th01, ph01)
    px = (xs[hit] + 0.5) / imh
    py = (ys[hit] + 0.5) / imh
    cam_locs = np.stack([px, py], axis=-1)            # camera-space
    uv_locs = np.stack([u_at[hit], v_at[hit]], axis=-1)  # atlas-space

    # uv2cam: per camera pixel, the atlas source coords. Samples sit at
    # the pixels themselves; the splat still dilates ~trust-radius
    # beyond the silhouette with nearest values (a real-data artifact).
    uv2cam = splat_unstruct(cam_locs, uv_locs, (imh, imh))
    # cam2uv: per atlas texel, the camera source coords. Seams between
    # islands, trust-radius holes where this camera sees no nearby
    # texel, and nearest-fill across self-occlusion boundaries all
    # arise here exactly as in the reference pipeline.
    cam2uv = splat_unstruct(uv_locs, cam_locs, (uvs, uvs))

    # ---- UV-space buffers: remap camera space through cam2uv
    # (reference: data_gen/render.py:174-179) ----
    rgb_uv = remap(rgb_camspc, cam2uv)
    lvis_uv = remap(lvis_cam, cam2uv)
    cvis_uv = remap(cvis_cam, cam2uv)

    return {
        "rgb_camspc": rgb_camspc.astype(np.float32),
        "alpha": alpha,
        "uv2cam": uv2cam,
        "rgb": rgb_uv.astype(np.float32),
        "lvis": lvis_uv.astype(np.float32),
        "cvis": cvis_uv.astype(np.float32),
        "cam2uv": cam2uv,
    }


def make_identity_uv(buffers, imh):
    """Fixed-view relighting: camera space IS the UV space. Warp fields
    become (alpha-masked) identity grids; UV buffers are replaced by
    their camera-space counterparts at camera resolution."""
    ys, xs = np.meshgrid(
        (np.arange(imh) + 0.5) / imh, (np.arange(imh) + 0.5) / imh,
        indexing="ij")
    ident = np.stack([xs, ys], axis=-1).astype(np.float32)
    fg = buffers["alpha"] > 0.5
    uv2cam = ident.copy()
    uv2cam[~fg] = 0.0
    # Camera-space cosine buffers: re-derive from the UV pass is wrong
    # here; resample camera-space ones via the original uv2cam instead.
    from util import remap
    lvis_cam = remap(buffers["lvis"], buffers["uv2cam"])
    cvis_cam = remap(buffers["cvis"], buffers["uv2cam"])
    return {
        "rgb_camspc": buffers["rgb_camspc"],
        "alpha": buffers["alpha"],
        "uv2cam": uv2cam,
        "cam2uv": uv2cam.copy(),
        "rgb": buffers["rgb_camspc"].copy(),
        "lvis": lvis_cam.astype(np.float32),
        "cvis": cvis_cam.astype(np.float32),
    }


def fibonacci_sphere(n, radius, hemisphere=True, phase=0.0):
    """Even-ish directions on the (upper hemi)sphere."""
    pts = []
    golden = np.pi * (3 - np.sqrt(5))
    for i in range(n):
        z = (i + 0.5) / n  # (0, 1): upper hemisphere
        if not hemisphere:
            z = 2 * z - 1
        r = np.sqrt(max(0.0, 1 - z * z))
        th = golden * i + phase
        pts.append([r * np.cos(th), r * np.sin(th), z])
    return np.asarray(pts) * radius


def write_config_dir(outdir, buffers, cam, light, nn):
    from PIL import Image

    os.makedirs(outdir, exist_ok=True)

    def w01(name, arr):
        arr8 = (np.clip(arr, 0, 1) * 255).round().astype(np.uint8)
        Image.fromarray(arr8).save(join(outdir, name))

    w01("rgb_camspc.png", buffers["rgb_camspc"])
    w01("alpha.png", buffers["alpha"])
    w01("rgb.png", buffers["rgb"])
    w01("lvis.png", buffers["lvis"])
    w01("cvis.png", buffers["cvis"])
    w01("uv2cam.png", np.clip(add_b_ch(buffers["uv2cam"]), 0, 1))
    w01("cam2uv.png", np.clip(add_b_ch(buffers["cam2uv"]), 0, 1))
    save_float16_npy(buffers["uv2cam"], join(outdir, "uv2cam.npy"))
    save_float16_npy(buffers["cam2uv"], join(outdir, "cam2uv.npy"))
    dump_json(cam, join(outdir, "cam.json"))
    dump_json(light, join(outdir, "light.json"))
    dump_json(nn, join(outdir, "nn.json"))


def main(args):
    cam_pts = fibonacci_sphere(args.n_cams, CAM_R)
    light_pts = fibonacci_sphere(args.n_lights, LIGHT_R, phase=1.234)
    cams = [
        {"name": "C%02d" % i, "position": p.tolist(),
         "focal_length": 50.0, "sensor_width": 36.0, "sensor_height": 36.0,
         "clip_start": 0.1, "clip_end": 100.0,
         "rotation": [0.0, 0.0, 0.0]}
        for i, p in enumerate(cam_pts)]
    lights = [
        {"name": "L%03d" % i, "position": p.tolist(), "size": 0.1}
        for i, p in enumerate(light_pts)]

    # Virtual (test) cams/lights: jittered interpolations.
    test_cam_pts = fibonacci_sphere(args.n_test, CAM_R, phase=0.5)
    test_light_pts = fibonacci_sphere(args.n_test, LIGHT_R, phase=2.0)
    test_cams = [
        {**cams[0], "name": "P%02dV" % i, "position": p.tolist()}
        for i, p in enumerate(test_cam_pts)]
    test_lights = [
        {**lights[0], "name": "L%03dV" % i, "position": p.tolist()}
        for i, p in enumerate(test_light_pts)]

    def nearest(pts_named, query_pos, exclude=None, k=None):
        """Nearest physical name, or the ordered k-nearest list."""
        scored = sorted(
            (np.linalg.norm(np.asarray(item["position"])
                            - np.asarray(query_pos)), item["name"])
            for item in pts_named if item["name"] != exclude)
        names = [name for _, name in scored]
        if k is None:
            return names[0] if names else None
        return names[:k]

    # trainvali: full cam x light product
    # (reference: gen_render_params_expects.py:112-121).
    i = 0
    jobs = []
    for cam in cams:
        for light in lights:
            id_ = "trainvali_%09d_%s_%s" % (i, cam["name"], light["name"])
            nn = {
                "cam": nearest(cams, cam["position"], exclude=cam["name"]),
                "light": nearest(
                    lights, light["position"], exclude=light["name"]),
                # k-nearest lists for multi-observation training
                # (datasets/nlt.py n_obs > 1).
                "cams": nearest(cams, cam["position"],
                                exclude=cam["name"], k=4),
                "lights": nearest(lights, light["position"],
                                  exclude=light["name"], k=4),
            }
            jobs.append((id_, cam, light, nn))
            i += 1
    # test: virtual cams/lights paired 1:1
    for j in range(args.n_test):
        cam = test_cams[j]
        light = test_lights[j]
        id_ = "test_%09d_%s_%s" % (j, cam["name"], light["name"])
        nn = {
            "cam": nearest(cams, cam["position"]),
            "light": nearest(lights, light["position"]),
            "cams": nearest(cams, cam["position"], k=4),
            "lights": nearest(lights, light["position"], k=4),
        }
        jobs.append((id_, cam, light, nn))

    global _MATERIAL_BLOBS
    _MATERIAL_BLOBS = args.material_blobs
    render_fn = (render_config_torus if args.shape == "torus"
                 else render_config)
    dump_json(
        {"shape": args.shape, "sss": bool(args.sss),
         "material_blobs": bool(args.material_blobs),
         "atlas": ({"islands": 4, "pad": ATLAS_PAD,
                    "R": TORUS_R, "r": TORUS_r}
                   if args.shape == "torus" else
                   {"islands": 1, "mapping": "lat-long"})},
        join(args.outroot, "scene.json"))
    for id_, cam, light, nn in jobs:
        buffers = render_fn(cam, light, args.imh, args.uvs, args.sss)
        if args.identity_uv:
            buffers = make_identity_uv(buffers, args.imh)
        write_config_dir(join(args.outroot, id_), buffers, cam, light, nn)
        print("rendered", id_)

    # Run the real postprocessing pipeline on the synthesized data.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import postproc
    albedo = postproc.compute_albedo(args.outroot)
    postproc._write01(albedo, join(args.outroot, "albedo.png"))
    postproc.gen_diffuse(args.outroot, albedo)
    out_json = args.outroot.rstrip("/") + ".json"
    filelist = postproc.gen_file_list(args.outroot, out_json)
    n_complete = sum(1 for v in filelist.values() if v["complete"])
    print("Synthesized %d configs (%d complete) under %s"
          % (len(filelist), n_complete, args.outroot))


if __name__ == "__main__":
    main(parser.parse_args())
