"""Tests for safe_math, color transforms, cubic spline, and channel
schedule — reference property sets re-derived (reference:
third_party/robust_loss/util_test.py, cubic_spline_test.py;
nlt/util/net.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.ops import color, cubic_spline, safe_math
from nlt_tpu.utils import net as netutil
from nlt_tpu.utils import img as imgutil

jax.config.update("jax_enable_x64", True)


# ---- safe_math ----

def test_affine_sigmoid_roundtrip(rng):
    v = jnp.asarray(rng.uniform(-5, 5, 128))
    for lo, hi in [(0, 1), (0.5, 1.5), (0.001, 1.999)]:
        y = safe_math.affine_sigmoid(v, lo, hi)
        assert np.all((np.asarray(y) > lo) & (np.asarray(y) < hi))
        back = safe_math.inv_affine_sigmoid(y, lo, hi)
        np.testing.assert_allclose(back, v, rtol=1e-6, atol=1e-6)


def test_affine_softplus_roundtrip(rng):
    v = jnp.asarray(rng.uniform(-5, 5, 128))
    for lo, ref in [(0, 1), (0.01, 0.02), (1e-5, 1.0)]:
        y = safe_math.affine_softplus(v, lo, ref)
        assert np.all(np.asarray(y) > lo)
        back = safe_math.inv_affine_softplus(y, lo, ref)
        np.testing.assert_allclose(back, v, rtol=1e-5, atol=1e-5)


def test_affine_softplus_maps_zero_to_ref():
    y = safe_math.affine_softplus(jnp.asarray(0.0), 0.01, 0.5)
    np.testing.assert_allclose(float(y), 0.5, rtol=1e-6)


def test_safe_fns_clamp():
    big = jnp.asarray(1e38)
    assert np.isfinite(float(safe_math.log_safe(big)))
    assert np.isfinite(float(safe_math.exp_safe(jnp.asarray(1000.0))))
    assert np.isfinite(float(safe_math.expm1_safe(jnp.asarray(1000.0))))
    assert np.isfinite(float(safe_math.log1p_safe(big)))


def test_students_t_nll_matches_scipy(rng):
    from scipy import stats
    x = rng.uniform(-4, 4, 64)
    df, scale = 3.0, 1.4
    got = safe_math.students_t_nll(
        jnp.asarray(x), jnp.asarray(df), jnp.asarray(scale))
    expect = -stats.t.logpdf(x, df, scale=scale)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


# ---- color ----

def test_syuv_is_volume_preserving():
    """The Jacobian determinant of rgb_to_syuv must be +/-1
    (reference: third_party/robust_loss/util.py:96-115)."""
    m = np.asarray(jax.jacfwd(
        lambda v: color.rgb_to_syuv(v))(jnp.ones(3)))
    np.testing.assert_allclose(abs(np.linalg.det(m)), 1.0, rtol=1e-6)


def test_syuv_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1, (4, 4, 3)))
    back = color.syuv_to_rgb(color.rgb_to_syuv(x))
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_image_dct_orthonormal(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16)))
    d = color.image_dct(x)
    # Orthonormal: preserves energy, invertible.
    np.testing.assert_allclose(
        float(jnp.sum(x ** 2)), float(jnp.sum(d ** 2)), rtol=1e-8)
    np.testing.assert_allclose(color.image_idct(d), x, atol=1e-8)


# ---- cubic spline ----

def test_spline_hits_knots():
    values = jnp.asarray(np.array([0.0, 1.0, 0.5, 2.0]))
    tangents = jnp.asarray(np.array([0.5, -0.5, 1.0, 0.0]))
    x = jnp.asarray(np.array([0.0, 1.0, 2.0, 3.0]))
    got = cubic_spline.interpolate1d(x, values, tangents)
    np.testing.assert_allclose(got, values, atol=1e-12)


def test_spline_linear_extrapolation():
    values = jnp.asarray(np.array([1.0, 2.0, 3.0]))
    tangents = jnp.asarray(np.array([2.0, 1.0, -1.0]))
    got_lo = float(cubic_spline.interpolate1d(
        jnp.asarray(-1.5), values, tangents))
    np.testing.assert_allclose(got_lo, 1.0 + 2.0 * (-1.5), atol=1e-10)
    got_hi = float(cubic_spline.interpolate1d(
        jnp.asarray(4.0), values, tangents))
    np.testing.assert_allclose(got_hi, 3.0 + (-1.0) * 2.0, atol=1e-10)


def test_spline_reproduces_cubic_hermite(rng):
    """Against a dense numpy evaluation of the Hermite basis."""
    values = rng.standard_normal(8)
    tangents = rng.standard_normal(8)
    xq = rng.uniform(0, 7, 200)
    got = np.asarray(cubic_spline.interpolate1d(
        jnp.asarray(xq), jnp.asarray(values), jnp.asarray(tangents)))
    lo = np.clip(np.floor(xq).astype(int), 0, 6)
    t = xq - lo
    h01 = -2 * t ** 3 + 3 * t ** 2
    h00 = 1 - h01
    h11 = t ** 3 - t ** 2
    h10 = h11 - t ** 2 + t
    expect = (values[lo] * h00 + values[lo + 1] * h01
              + tangents[lo] * h10 + tangents[lo + 1] * h11)
    np.testing.assert_allclose(got, expect, atol=1e-10)


# ---- channel schedule ----

def test_gen_feat_n_reference_example():
    assert netutil.gen_feat_n(8, 64) == [8, 16, 32, 64, 64, 32, 16, 8, 4, 3]


def test_gen_feat_n_dragon_specular():
    # depth0=16, depth=256 (reference: nlt/config/dragon_specular.ini:59-60)
    got = netutil.gen_feat_n(16, 256)
    assert got == [16, 32, 64, 128, 256, 256, 128, 64, 32, 16, 8, 4, 3]


def test_gen_feat_n_flat():
    assert netutil.gen_feat_n(16, 16) == [16, 16, 8, 4, 3]


def test_gen_feat_n_custom_final():
    got = netutil.gen_feat_n(8, 32, final_n=4)
    assert got[-1] == 4
    assert all(n >= 4 for n in got)


# ---- image utils ----

def test_linear2srgb_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)))
    back = imgutil.srgb2linear(imgutil.linear2srgb(x))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_set_left_top_corner():
    x = jnp.ones((2, 4, 4, 3))
    y = imgutil.set_left_top_corner(x, 0.0)
    assert float(y[0, 0, 0, 0]) == 0.0
    assert float(y[0, 0, 1, 0]) == 1.0
    assert float(y[1, 3, 3, 2]) == 1.0


def test_alpha_blend():
    t1 = jnp.full((2, 2, 3), 0.8)
    t2 = jnp.full((2, 2, 3), 0.2)
    alpha = jnp.full((2, 2, 1), 0.5)
    out = imgutil.alpha_blend(t1, alpha, t2)
    np.testing.assert_allclose(out, np.full((2, 2, 3), 0.5), atol=1e-7)


def test_resize_shapes(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)))
    y = imgutil.resize(x, new_h=8, new_w=8)
    assert y.shape == (2, 8, 8, 3)
    # Host path with aspect preservation
    z = imgutil.resize(np.ones((16, 32)), new_h=8)
    assert z.shape == (8, 16)


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)))
    y = imgutil.gaussian_blur(x, sigma=2.0)
    assert y.shape == x.shape
    # Interior mean approximately preserved
    np.testing.assert_allclose(
        float(jnp.mean(y[:, 8:-8, 8:-8])),
        float(jnp.mean(x[:, 8:-8, 8:-8])), atol=0.02)


def test_metric_classes():
    """The evaluation metric classes (counterparts of xm.metric.PSNR/
    SSIM/LPIPS — reference: xiuminglib/metric.py:105-257)."""
    rng = np.random.RandomState(7)
    from nlt_tpu.metrics import LPIPS, PSNR, SSIM

    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    noise = rng.normal(0, 0.05, a.shape).astype(np.float32)
    b = np.clip(a + noise, 0, 1)

    psnr = PSNR()
    assert psnr(a, a) == float("inf")
    v = psnr(a, b)
    assert 10 < v < 40
    # Mask restricts the luma MSE to masked pixels.
    mask = np.zeros((32, 32), bool)
    mask[:16] = True
    b_half = a.copy()
    b_half[16:] += 0.5  # corrupt only the unmasked half
    assert psnr(a, np.clip(b_half, 0, 1), mask=mask) == float("inf")

    ssim = SSIM()
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-5)
    assert ssim(a, b) < 1.0

    lpips = LPIPS()  # deterministic random features (no artifact)
    assert lpips(a, a) == pytest.approx(0.0, abs=1e-6)
    assert lpips(a, b) > 0
    # Sub-32px inputs have empty deep feature maps: loud error, not NaN.
    tiny = a[:16, :16]
    with pytest.raises(AssertionError):
        lpips(tiny, tiny)
