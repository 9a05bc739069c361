"""Fused Pallas stage kernels (ops/fused_stage.py): forward and all
five gradients pinned against both the pure-XLA reference formulation
and the production elements path, plus whole-model equivalence when
convnet swaps the fused layers in (NLT_TPU_FUSED_STAGE). Runs in the
Pallas interpreter on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.networks import elements as el
from nlt_tpu.ops import fused_stage as fs


def _t(rng, *s):
    return jnp.asarray(rng.standard_normal(s).astype(np.float32))


@pytest.mark.parametrize("shape,o", [((2, 16, 24, 6), 10),
                                     ((1, 8, 8, 3), 4)])
@pytest.mark.parametrize("slope", [0.3, 0.0])
def test_contract_stage_matches_elements(rng, shape, o, slope):
    x = _t(rng, *shape)
    c = shape[3]
    w1, b1 = _t(rng, 2, 2, c, o) * 0.3, _t(rng, o) * 0.1
    w2, b2 = _t(rng, 2, 2, o, o) * 0.3, _t(rng, o) * 0.1
    lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=slope)
    c1, c2 = el.conv(2, o, stride=2), el.conv(2, o, stride=1)
    want = lrelu(c2.apply({"w": w2, "b": b2},
                          lrelu(c1.apply({"w": w1, "b": b1}, x))))
    got = fs.contract_stage(x, w1, b1, w2, b2, slope, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("slope", [0.3, 0.0])
def test_expand_stage_matches_elements(rng, slope):
    x = _t(rng, 2, 8, 12, 10)
    c, o = 10, 6
    w1, b1 = _t(rng, 2, 2, c, o) * 0.3, _t(rng, o) * 0.1
    w2, b2 = _t(rng, 2, 2, o, o) * 0.3, _t(rng, o) * 0.1
    lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=slope)
    d1, d2 = el.deconv(2, o, stride=2), el.deconv(2, o, stride=1)
    want = lrelu(d2.apply({"w": w2, "b": b2},
                          lrelu(d1.apply({"w": w1, "b": b1}, x))))
    got = fs.expand_stage(x, w1, b1, w2, b2, slope, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("kind", ["contract", "expand"])
def test_gradients_match_reference_autodiff(rng, kind):
    """The hand-derived custom_vjp backward equals jax.grad of the
    reference formulation for every input."""
    if kind == "contract":
        x = _t(rng, 2, 16, 8, 5)
        c, o = 5, 7
        fused, ref = fs.contract_stage, fs.contract_stage_ref
    else:
        x = _t(rng, 2, 8, 4, 7)
        c, o = 7, 5
        fused, ref = fs.expand_stage, fs.expand_stage_ref
    args = (x, _t(rng, 2, 2, c, o) * 0.3, _t(rng, o) * 0.1,
            _t(rng, 2, 2, o, o) * 0.3, _t(rng, o) * 0.1)

    def loss_ref(*a):
        y, _ = ref(*a)
        return jnp.sum(jnp.sin(y))

    def loss_fused(*a):
        return jnp.sum(jnp.sin(fused(*a, 0.3, True)))

    gr = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    for name, a, b in zip("x w1 b1 w2 b2".split(), gr, gf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=f"{kind} grad {name}")


def test_block_halo_boundaries(rng):
    """Multi-block grids reproduce single-block results exactly (the
    halo row/index-map clamping logic)."""
    x = _t(rng, 1, 32, 16, 4)
    o = 6
    args = (_t(rng, 2, 2, 4, o) * 0.3, _t(rng, o) * 0.1,
            _t(rng, 2, 2, o, o) * 0.3, _t(rng, o) * 0.1)
    one = fs._contract_fwd_pallas(x, *args, interpret=True,
                                  block_rows=16)[0]
    many = fs._contract_fwd_pallas(x, *args, interpret=True,
                                   block_rows=2)[0]
    np.testing.assert_allclose(np.asarray(one), np.asarray(many),
                               atol=1e-6)
    xe = _t(rng, 1, 16, 8, o)
    argse = (_t(rng, 2, 2, o, 4) * 0.3, _t(rng, 4) * 0.1,
             _t(rng, 2, 2, 4, 4) * 0.3, _t(rng, 4) * 0.1)
    one = fs._expand_fwd_pallas(xe, *argse, interpret=True,
                                block_rows=16)[0]
    many = fs._expand_fwd_pallas(xe, *argse, interpret=True,
                                 block_rows=2)[0]
    np.testing.assert_allclose(np.asarray(one), np.asarray(many),
                               atol=1e-6)


def test_model_equivalent_with_fused_stages(rng, monkeypatch):
    """The whole NLT model produces the same loss and gradients with
    fused stages swapped in (NLT_TPU_FUSED_STAGE)."""
    from nlt_tpu.models import get_model_class
    from nlt_tpu.networks import convnet
    from tests.test_model_nlt import make_batch, small_config

    cfg = small_config()
    batch = make_batch(rng)

    def loss_and_grads():
        model = get_model_class("nlt")(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        def loss_fn(p):
            pred, gt, kwargs, _ = model.apply(p, batch, "train")
            return jnp.mean(model.compute_loss(p, pred, gt, **kwargs))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return float(loss), grads

    monkeypatch.setattr(convnet, "_FUSED_STAGE", False)
    loss_seq, g_seq = loss_and_grads()
    monkeypatch.setattr(convnet, "_FUSED_STAGE", True)
    loss_fused, g_fused = loss_and_grads()

    assert abs(loss_seq - loss_fused) < 1e-5
    flat_s = jax.tree_util.tree_leaves(g_seq)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_s) == len(flat_f)
    for a, b in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("packing", [1, 2, 4, 8])
def test_contract_packed_layouts_equal(rng, packing):
    """Column-packed lane layouts (block-matrix weights on a free
    reshape view) reproduce the plain kernel bit-for-bit."""
    x = _t(rng, 2, 16, 32, 4)  # c2=8, W2=16: supports P up to 8
    o = 6
    args = (_t(rng, 2, 2, 4, o) * 0.3, _t(rng, o) * 0.1,
            _t(rng, 2, 2, o, o) * 0.3, _t(rng, o) * 0.1)
    want, y1w = fs._contract_fwd_pallas(
        x, *args, interpret=True, packing=1)
    got, y1g = fs._contract_fwd_pallas(
        x, *args, interpret=True, packing=packing)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y1g), np.asarray(y1w),
                               atol=1e-6)


@pytest.mark.parametrize("packing", [2, 4])
def test_expand_packed_layouts_equal(rng, packing):
    """The packed expanding kernel (interleaves folded into kron block
    weights) equals the plain kernel and the elements path."""
    x = _t(rng, 2, 8, 16, 6)
    c, o = 6, 5
    args = (_t(rng, 2, 2, c, o) * 0.3, _t(rng, o) * 0.1,
            _t(rng, 2, 2, o, o) * 0.3, _t(rng, o) * 0.1)
    want, y1w = fs._expand_fwd_pallas(
        x, *args, interpret=True, packing=1)
    got, y1g = fs._expand_fwd_pallas(
        x, *args, interpret=True, packing=packing)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y1g), np.asarray(y1w),
                               atol=1e-6)


def test_fused_stages_bfloat16(rng):
    """The kernels run in bf16 activations (compute_dtype knob): f32
    matmul accumulation inside, outputs within bf16 tolerance of the
    f32 path."""
    x = _t(rng, 1, 16, 16, 6)
    o = 8
    args = (_t(rng, 2, 2, 6, o) * 0.3, _t(rng, o) * 0.1,
            _t(rng, 2, 2, o, o) * 0.3, _t(rng, o) * 0.1)
    f32 = fs.contract_stage(x, *args, 0.3, True)
    bf = fs.contract_stage(x.astype(jnp.bfloat16), *args, 0.3, True)
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf, np.float32), np.asarray(f32), atol=0.05,
        rtol=0.05)

    xe = _t(rng, 1, 8, 8, o)
    argse = (_t(rng, 2, 2, o, 6) * 0.3, _t(rng, 6) * 0.1,
             _t(rng, 2, 2, 6, 6) * 0.3, _t(rng, 6) * 0.1)
    f32e = fs.expand_stage(xe, *argse, 0.3, True)
    bfe = fs.expand_stage(xe.astype(jnp.bfloat16), *argse, 0.3, True)
    assert bfe.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bfe, np.float32), np.asarray(f32e), atol=0.05,
        rtol=0.05)
