"""Resampler tests: identity warp, bilinear correctness vs scipy
map_coordinates, zero boundary semantics, and gradient checks vs finite
differences (M2 contract; reference op: tfa.image.resampler used at
nlt/models/nlt.py:112-115)."""

import jax
import jax.numpy as jnp
import numpy as np

from nlt_tpu.ops import resample

jax.config.update("jax_enable_x64", True)


def _identity_warp(h, w, n=1):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    warp = np.stack([xs, ys], axis=-1).astype(np.float64)
    return np.tile(warp[None], (n, 1, 1, 1))


def test_identity_warp(rng):
    img = rng.uniform(0, 1, (2, 8, 8, 3))
    warp = _identity_warp(8, 8, 2)
    out = resample.resample(jnp.asarray(img), jnp.asarray(warp))
    np.testing.assert_allclose(out, img, atol=1e-12)


def test_matches_map_coordinates(rng):
    from scipy.ndimage import map_coordinates
    img = rng.uniform(0, 1, (6, 7))
    warp_x = rng.uniform(0, 6, (5, 5))
    warp_y = rng.uniform(0, 5, (5, 5))
    warp = np.stack([warp_x, warp_y], axis=-1)
    out = resample.resample(
        jnp.asarray(img[None, :, :, None]),
        jnp.asarray(warp[None]))[0, :, :, 0]
    expect = map_coordinates(img, [warp_y, warp_x], order=1, mode="constant")
    np.testing.assert_allclose(out, expect, atol=1e-10)


def test_zero_outside(rng):
    img = rng.uniform(0.5, 1, (1, 4, 4, 1))
    warp = np.full((1, 2, 2, 2), 100.0)
    out = resample.resample(jnp.asarray(img), jnp.asarray(warp))
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    warp_neg = np.full((1, 2, 2, 2), -5.0)
    out2 = resample.resample(jnp.asarray(img), jnp.asarray(warp_neg))
    np.testing.assert_array_equal(np.asarray(out2), 0.0)


def test_partial_boundary_contribution():
    """A query at x=-0.5 on row 0 should get half the first column's value
    (zero padding outside)."""
    img = np.ones((1, 4, 4, 1))
    warp = np.zeros((1, 1, 1, 2))
    warp[0, 0, 0] = [-0.5, 0.0]
    out = resample.resample(jnp.asarray(img), jnp.asarray(warp))
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 0.5, atol=1e-12)


def test_grad_wrt_image_matches_fd(rng):
    img = rng.uniform(0, 1, (1, 5, 5, 1))
    warp = np.stack([
        rng.uniform(0.2, 3.8, (1, 4, 4)),
        rng.uniform(0.2, 3.8, (1, 4, 4))], axis=-1)

    def f(im):
        return jnp.sum(resample.resample(im, jnp.asarray(warp)) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(img)))
    eps = 1e-6
    for idx in [(0, 0, 0, 0), (0, 2, 3, 0), (0, 4, 4, 0)]:
        p = img.copy()
        p[idx] += eps
        m = img.copy()
        m[idx] -= eps
        fd = (float(f(jnp.asarray(p))) - float(f(jnp.asarray(m)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=1e-5, atol=1e-8)


def test_grad_wrt_warp_matches_fd(rng):
    img = rng.uniform(0, 1, (1, 5, 5, 2))
    warp = np.stack([
        rng.uniform(0.3, 3.7, (1, 3, 3)),
        rng.uniform(0.3, 3.7, (1, 3, 3))], axis=-1)
    # Keep away from integer coords where bilinear grad is discontinuous.
    warp = np.where(np.abs(warp - np.round(warp)) < 0.05, warp + 0.1, warp)

    def f(w):
        return jnp.sum(resample.resample(jnp.asarray(img), w) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(warp)))
    eps = 1e-7
    for idx in [(0, 0, 0, 0), (0, 1, 2, 1), (0, 2, 2, 0)]:
        p = warp.copy()
        p[idx] += eps
        m = warp.copy()
        m[idx] -= eps
        fd = (float(f(jnp.asarray(p))) - float(f(jnp.asarray(m)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=1e-4, atol=1e-8)


def test_batch_independence(rng):
    imgs = rng.uniform(0, 1, (3, 6, 6, 2))
    warps = np.stack([_identity_warp(6, 6)[0]] * 3)
    warps[1] += 0.5
    out = np.asarray(resample.resample(jnp.asarray(imgs), jnp.asarray(warps)))
    out0 = np.asarray(resample.resample(
        jnp.asarray(imgs[:1]), jnp.asarray(warps[:1])))
    np.testing.assert_allclose(out[0], out0[0], atol=1e-12)


def test_flat_matches_percorner_values_and_grads(rng):
    """The production flat-take formulation is exactly equivalent to the
    naive per-corner-gather formulation, including out-of-range taps,
    boundary straddles, and both gradients."""
    import jax

    n, h, w, c = 3, 9, 11, 2
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    # Coordinates spanning: interior, fractional boundary straddles,
    # fully outside (both sides), and exact integer hits.
    warp = jnp.asarray(
        rng.uniform(-3.0, max(h, w) + 3.0, (n, 7, 8, 2))
        .astype(np.float32))
    warp = warp.at[:, 0, 0].set(jnp.array([0.0, 0.0]))
    warp = warp.at[:, 0, 1].set(jnp.array([w - 1.0, h - 1.0]))
    warp = warp.at[:, 0, 2].set(jnp.array([-0.5, -0.5]))
    warp = warp.at[:, 0, 3].set(jnp.array([w - 0.5, h - 0.5]))

    out_flat = resample.resample(img, warp, impl="xla")
    out_ref = resample.resample(img, warp, impl="percorner")
    np.testing.assert_allclose(
        np.asarray(out_flat), np.asarray(out_ref), rtol=1e-6, atol=1e-6)

    g = jnp.asarray(rng.rand(*out_ref.shape).astype(np.float32))

    def loss(im, wp, impl):
        return jnp.sum(resample.resample(im, wp, impl=impl) * g)

    gi_f, gw_f = jax.grad(loss, argnums=(0, 1))(img, warp, "xla")
    gi_r, gw_r = jax.grad(loss, argnums=(0, 1))(img, warp, "percorner")
    np.testing.assert_allclose(
        np.asarray(gi_f), np.asarray(gi_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gw_f), np.asarray(gw_r), rtol=1e-5, atol=1e-5)


def test_planned_matches_standard_values_and_grads(rng):
    """resample_planned(img, make_plan(warp)) == resample(img, warp),
    values and image-gradients, incl. out-of-range warps."""
    n, h, w, c = 2, 12, 11, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)))
    warp = jnp.asarray(np.stack([
        rng.uniform(-2, w + 2, (n, 9, 10)),
        rng.uniform(-2, h + 2, (n, 9, 10))], axis=-1))
    plan = resample.make_plan(warp, h, w)

    out_std = resample.resample(img, warp)
    out_pl = resample.resample_planned(img, plan)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_std), rtol=1e-12, atol=1e-12)

    g = jnp.asarray(rng.uniform(-1, 1, out_std.shape))
    grad_std = jax.grad(
        lambda im: jnp.sum(resample.resample(im, warp) * g))(img)
    grad_pl = jax.grad(
        lambda im: jnp.sum(resample.resample_planned(im, plan) * g))(img)
    np.testing.assert_allclose(
        np.asarray(grad_pl), np.asarray(grad_std),
        rtol=1e-12, atol=1e-12)


def test_planned_zero_grad_texel_drop(rng):
    """A plan built with zero_grad_texel=(0, 0) (the model's corner
    blackout) yields identical values, and identical image gradients
    once the corner's gradient is discarded — for a warp with a real
    background region (queries pinned to (0, 0), the NLT convention)."""
    from nlt_tpu.ops import scatter_pallas
    from nlt_tpu.utils.img import set_left_top_corner

    n, h, w, c = 2, 16, 16, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    warp = (_identity_warp(h, w, n)
            + rng.uniform(0, 1, (n, h, w, 2))).astype(np.float32)
    warp[:, :5] = 0.0  # background rows: query exactly (0, 0)
    warp[:, 5, :4] = -3.0  # fully out of bounds: zero weights
    warp = jnp.asarray(warp)
    plan = resample.make_plan(warp, h, w, zero_grad_texel=(0, 0))
    plan_plain = resample.make_plan(warp, h, w)

    img_c = set_left_top_corner(img, 0.0)
    np.testing.assert_allclose(
        np.asarray(resample.resample_planned(img_c, plan)),
        np.asarray(resample.resample(img_c, warp)),
        rtol=1e-6, atol=1e-6)

    # Background queries must actually be dropped from the routing
    # (routed to the dump row), unlike the plain plan.
    n_live = int(np.sum(np.asarray(plan["lo"]) < np.asarray(plan["hi"])))
    n_live_plain = int(np.sum(
        np.asarray(plan_plain["lo"]) < np.asarray(plan_plain["hi"])))
    assert n_live <= n_live_plain

    g = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))

    def loss(im, pl):
        warped = resample.resample_planned(
            set_left_top_corner(im, 0.0), pl)
        return jnp.sum(warped * g)

    def forced(n_groups, res, grads):
        _, routed, lo, hi, n_rows = res
        return (scatter_pallas.scatter_add_rows_planned(
            routed, lo, hi, grads, n_rows, n_groups),
            None, None, None, None)

    grad_ref = jax.grad(
        lambda im: jnp.sum(
            resample.resample(set_left_top_corner(im, 0.0), warp) * g)
    )(img)
    orig = resample._take_rows_planned_bwd
    resample._take_rows_planned.defvjp(
        resample._take_rows_planned_fwd, forced)
    try:
        grad_dropped = jax.grad(loss)(img, plan)
    finally:
        resample._take_rows_planned.defvjp(
            resample._take_rows_planned_fwd, orig)
    np.testing.assert_allclose(
        np.asarray(grad_dropped), np.asarray(grad_ref),
        rtol=1e-5, atol=1e-6)


def test_planned_kernel_route_matches_fallback(rng, monkeypatch):
    """Force the planned VJP through the Pallas kernel (interpret mode
    on CPU) and check gradients equal the XLA-scatter fallback."""
    from nlt_tpu.ops import scatter_pallas

    n, h, w, c = 2, 16, 16, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    warp = jnp.asarray(
        (_identity_warp(h, w, n)
         + rng.uniform(0, 1, (n, h, w, 2))).astype(np.float32))
    plan = resample.make_plan(warp, h, w)
    g = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))

    def loss(im):
        return jnp.sum(resample.resample_planned(im, plan) * g)

    grad_fallback = jax.grad(loss)(img)

    def forced(n_groups, res, grads):
        _, routed, lo, hi, n_rows = res
        return (scatter_pallas.scatter_add_rows_planned(
            routed, lo, hi, grads, n_rows, n_groups),
            None, None, None, None)

    orig = resample._take_rows_planned_bwd
    resample._take_rows_planned.defvjp(
        resample._take_rows_planned_fwd, forced)
    try:
        grad_kernel = jax.grad(loss)(img)
    finally:
        resample._take_rows_planned.defvjp(
            resample._take_rows_planned_fwd, orig)
    np.testing.assert_allclose(
        np.asarray(grad_kernel), np.asarray(grad_fallback),
        rtol=1e-6, atol=1e-6)


def test_compact_planned_matches_standard(rng):
    """Forward-take compaction (make_plan(compact_rows=K)): gathering
    only the live query rows and scatter-setting them into the output
    grid must reproduce the standard planned resample EXACTLY — values
    and image gradients — when the caller blacks the zero-grad texel
    (the NLT model's contract). ~50% of queries here are background
    (warp == 0 -> the blacked corner)."""
    from nlt_tpu.ops import resample as resample_mod
    from nlt_tpu.utils import img as imgutil

    n, h, w, c = 2, 24, 24, 3
    img = jnp.asarray(rng.uniform(0.1, 1, (n, h, w, c)), jnp.float32)
    img = imgutil.set_left_top_corner(img, 0.0)
    ho, wo = 20, 20
    # Half the queries are live in-bounds warps, half exact-zero
    # background (routed to the blacked corner), a few fully OOB.
    warp = rng.uniform(0, w - 1.01, (n, ho, wo, 2)).astype(np.float32)
    mask = rng.uniform(size=(n, ho, wo)) < 0.5
    warp[mask] = 0.0
    warp[:, :2, :2] = -50.0  # fully out of bounds -> dead
    warp = jnp.asarray(warp)

    plan = resample_mod.make_plan(warp, h, w, zero_grad_texel=(0, 0))
    cap = int(np.ceil(0.6 * ho * wo))
    cplan = resample_mod.make_plan(
        warp, h, w, zero_grad_texel=(0, 0), compact_rows=cap)
    assert int(np.asarray(cplan["clive"]).max()) <= cap

    out = resample_mod.resample_planned(img, plan)
    for route in ("take", "scatter"):
        out_c = resample_mod.resample_planned(
            img, cplan, out_hw=(ho, wo), compact_route=route)
        np.testing.assert_allclose(
            np.asarray(out_c), np.asarray(out), rtol=1e-6, atol=1e-6,
            err_msg=route)

    # Image gradients (through set_left_top_corner, as the model does).
    def loss(im, p, kw):
        im = imgutil.set_left_top_corner(im, 0.0)
        r = resample_mod.resample_planned(im, p, **kw)
        return jnp.sum(jnp.sin(3.0 * r))

    g = jax.grad(loss)(img, plan, {})
    for route in ("take", "scatter"):
        g_c = jax.grad(loss)(
            img, cplan, {"out_hw": (ho, wo), "compact_route": route})
        np.testing.assert_allclose(
            np.asarray(g_c), np.asarray(g), rtol=1e-5, atol=1e-6,
            err_msg=route)


def test_compact_plan_overflow_refused():
    import pytest
    """A scene with more live queries than the static capacity must be
    refused loudly at cache insert (parallel/feat_cache), never
    silently truncated."""
    from nlt_tpu.ops import resample as resample_mod
    from nlt_tpu.parallel import feat_cache as feat_cache_mod

    n, h, w = 1, 16, 16
    warp = jnp.ones((n, 12, 12, 2), jnp.float32) * 5.0  # all live
    cap = 40  # < 144 live
    cplan = resample_mod.make_plan(
        warp, h, w, zero_grad_texel=(0, 0), compact_rows=cap)
    assert int(np.asarray(cplan["clive"])[0]) == 144

    cache = feat_cache_mod.GTFeatureCache(["ex0"], cap_mb=64)
    feats = {"feats": {}, "products": {"pred_plan": cplan}}
    with pytest.raises(ValueError, match="take_compact_frac"):
        cache.insert(["ex0"], feats)
