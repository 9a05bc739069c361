"""NLT model tests: end-to-end apply shapes, residual path, obs
aggregation and override, loss computation, jit-ability
(reference dataflow: nlt/models/nlt.py:89-199)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.models import get_model_class
from nlt_tpu.utils.config import Config

UVH = 32
IMH = 32


def small_config(**overrides):
    cfg = {
        "dataset": "nlt", "model": "nlt",
        "loss": "l1",
        "imh": IMH, "imw": IMH, "uvh": UVH, "uvw": UVH,
        "use_obs": True, "skip_connect_base": True,
        "linear_space": False,
        "depth0": 16, "depth": 16, "kernel": 2, "stride": 2,
        "norm": "None", "act": "leakyrelu", "pool": "None",
        "bs": 2,
    }
    cfg.update(overrides)
    return Config(cfg)


def make_batch(rng, n=2, uvh=UVH, imh=IMH, identity_warp=False):
    def img(c, h=uvh):
        return jnp.asarray(rng.uniform(0, 1, (n, h, h, c)).astype(np.float32))

    if identity_warp:
        xs, ys = np.meshgrid(np.arange(uvh), np.arange(uvh))
        warp = np.stack([xs / uvh, ys / uvh], axis=-1).astype(np.float32)
        warp = jnp.asarray(np.tile(warp[None], (n, 1, 1, 1)))
    else:
        warp = jnp.asarray(
            rng.uniform(0, 1, (n, uvh, uvh, 2)).astype(np.float32))
    return {
        "base": img(3), "cvis": img(1), "lvis": img(1), "warp": warp,
        "rgb": img(3), "rgb_camspc": img(3, imh),
        "nn_base": img(3), "nn_rgb": img(3), "nn_rgb_camspc": img(3, imh),
    }


@pytest.fixture
def model():
    return get_model_class("nlt")(small_config())


@pytest.fixture
def params(model):
    return model.init_params(jax.random.PRNGKey(0))


def test_apply_shapes_train(model, params, rng):
    batch = make_batch(rng)
    pred, gt, loss_kwargs, to_vis = model.apply(params, batch, "train")
    assert pred.shape == (2, IMH, IMH, 3)
    assert gt.shape == (2, IMH, IMH, 3)
    assert loss_kwargs == {}
    for k in ("base_camspc", "pred", "pred_camspc", "nn_camspc", "gt",
              "gt_camspc"):
        assert k in to_vis


def test_apply_shapes_test(model, params, rng):
    batch = make_batch(rng)
    pred, gt, loss_kwargs, to_vis = model.apply(params, batch, "test")
    assert pred.shape == (2, IMH, IMH, 3)
    assert gt is None and loss_kwargs is None
    assert "gt" not in to_vis


def test_invalid_mode(model, params, rng):
    with pytest.raises(ValueError):
        model.apply(params, make_batch(rng), "predict")


def test_residual_skip_connect_base(rng):
    """With skip_connect_base, zeroing the net's final conv makes
    pred == base in UV space."""
    model = get_model_class("nlt")(small_config())
    params = model.init_params(jax.random.PRNGKey(0))
    # Zero the final 1x1 conv of the query net
    final = params["net"]["query"][-1]
    final["w"] = jnp.zeros_like(final["w"])
    final["b"] = jnp.zeros_like(final["b"])
    batch = make_batch(rng, identity_warp=True)
    _, _, _, to_vis = model.apply(params, batch, "train")
    np.testing.assert_allclose(
        np.asarray(to_vis["pred"]), np.asarray(batch["base"]), atol=1e-6)


def test_use_obs_false_ignores_neighbors(rng):
    model = get_model_class("nlt")(small_config(use_obs=False))
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(rng)
    pred1, _, _, _ = model.apply(params, batch, "train")
    batch2 = dict(batch)
    batch2["nn_rgb"] = batch["nn_rgb"] * 0.1
    pred2, _, _, _ = model.apply(params, batch2, "train")
    np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred2))


def test_use_obs_true_uses_neighbors(model, params, rng):
    batch = make_batch(rng)
    pred1, _, _, _ = model.apply(params, batch, "train")
    batch2 = dict(batch)
    batch2["nn_rgb"] = batch["nn_rgb"] * 0.1
    pred2, _, _, _ = model.apply(params, batch2, "train")
    assert float(jnp.abs(pred1 - pred2).max()) > 1e-7


def test_obs_override_substitutes_features(model, params, rng):
    """obs_override replaces obs_agg at each contracting stage
    (reference: nlt/models/nlt.py:172-173)."""
    batch = make_batch(rng)
    feats = model.extract_obs_features(
        params["net"], batch["nn_rgb"] - batch["nn_base"])
    # Build override aligned to query stage indices: contracting stages
    # are 0..len(feats)-1.
    override = {i: f for i, f in enumerate(feats)}
    pred_ov, _, _, _ = model.apply(
        params, batch, "train", obs_override=override)
    pred_plain, _, _, _ = model.apply(params, batch, "train")
    # Overriding with the same features must reproduce the plain forward.
    np.testing.assert_allclose(
        np.asarray(pred_ov), np.asarray(pred_plain), atol=1e-6)


def test_compute_loss_and_grads(model, params, rng):
    batch = make_batch(rng)

    def loss_fn(p):
        pred, gt, kwargs, _ = model.apply(p, batch, "train")
        return model.compute_loss(p, pred, gt, **kwargs)

    loss = float(loss_fn(params))
    assert np.isfinite(loss) and loss > 0
    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g["net"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_apply_jits(model, params, rng):
    batch = make_batch(rng)

    @jax.jit
    def fwd(p, b):
        pred, gt, _, _ = model.apply(p, b, "train")
        return pred, gt

    pred, gt = fwd(params, batch)
    pred2, gt2 = model.apply(params, batch, "train")[:2]
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(pred2), atol=1e-5)


def test_barron_lpips_config(rng):
    """The flagship loss spec compiles and differentiates end to end
    (reference: nlt/config/dragon_specular.ini:17)."""
    model = get_model_class("nlt")(small_config(loss="barron,1e+0lpips"))
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(rng)

    def loss_fn(p):
        pred, gt, kwargs, _ = model.apply(p, batch, "train")
        return model.compute_loss(p, pred, gt, **kwargs)

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(g["net"])
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_remat_identical_outputs_and_grads(model, params, rng):
    """remat=True (per-stage jax.checkpoint) changes memory, not math:
    outputs and gradients match the plain model."""
    model_r = get_model_class("nlt")(small_config(remat=True))
    batch = make_batch(rng)

    pred, _, _, _ = model.apply(params, batch, "train")
    pred_r, _, _, _ = model_r.apply(params, batch, "train")
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(pred_r), atol=1e-6)

    def loss_of(m):
        def f(p):
            pr, gt, kw, _ = m.apply(p, batch, "train")
            return jnp.mean(m.compute_loss(p, pr, gt, **kw))
        return jax.grad(f)(params)

    g, g_r = loss_of(model), loss_of(model_r)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6)
