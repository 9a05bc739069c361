"""E-LPIPS: ensemble-transformed LPIPS (losses/elpips.py) — the loss
the reference's parser names but never implements
(reference: nlt/models/base.py:49-51)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu import losses as losses_mod
from nlt_tpu.losses import elpips as elpips_mod
from nlt_tpu.utils.config import Config


@pytest.fixture(scope="module")
def setup():
    loss = losses_mod.ELPIPS(n_samples=2)
    params = loss.init_params()
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    pred = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    return loss, params, gt, pred


def test_identical_images_zero(setup):
    loss, params, gt, _ = setup
    for seed in (0, 1, 2):
        v = loss(params, gt, gt, key=jax.random.PRNGKey(seed))
        assert abs(float(v)) < 1e-6


def test_deterministic_given_key(setup):
    loss, params, gt, pred = setup
    k = jax.random.PRNGKey(3)
    v1 = float(loss(params, gt, pred, key=k))
    v2 = float(loss(params, gt, pred, key=k))
    assert v1 == v2


def test_stochastic_across_keys(setup):
    loss, params, gt, pred = setup
    vals = {float(loss(params, gt, pred, key=jax.random.PRNGKey(s)))
            for s in range(4)}
    assert len(vals) > 1  # different transforms -> different values
    # All samples in a sane range around plain LPIPS.
    plain = float(losses_mod.LPIPS()(params, gt, pred))
    for v in vals:
        assert 0 < v < 10 * plain + 1


def test_no_key_uses_fixed_seed(setup):
    loss, params, gt, pred = setup
    assert float(loss(params, gt, pred)) == float(loss(params, gt, pred))


def test_gradients_flow(setup):
    loss, params, gt, pred = setup
    g = jax.grad(
        lambda p: loss(params, gt, p, key=jax.random.PRNGKey(0)))(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_transform_applied_identically():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    ta, tb = elpips_mod.random_transform(jax.random.PRNGKey(5), a, a)
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
    assert ta.shape == a.shape


def test_build_losses_parses_elpips():
    cfg = Config({"elpips_samples": 3, "lpips_weights": "none"})
    wloss = losses_mod.build_losses("1e-1elpips", config=cfg)
    assert len(wloss) == 1
    weight, loss = wloss[0]
    assert weight == pytest.approx(0.1)
    assert isinstance(loss, losses_mod.ELPIPS)
    assert loss.n_samples == 3
    assert loss.stochastic and not loss.cacheable_gt


def test_end_to_end_train_step_with_elpips():
    """A model configured with barron,elpips trains one jitted step and
    draws per-step ensemble keys from the step counter."""
    from nlt_tpu.models import get_model_class
    from nlt_tpu.parallel import train as train_mod

    cfg = Config({
        "dataset": "nlt", "model": "nlt", "loss": "barron,1e+0elpips",
        "lpips_weights": "none",
        "imh": 32, "imw": 32, "uvh": 32, "uvw": 32,
        "use_obs": True, "skip_connect_base": True,
        "linear_space": False,
        "depth0": 16, "depth": 16, "kernel": 2, "stride": 2,
        "norm": "None", "act": "leakyrelu", "pool": "None", "bs": 2,
    })
    model = get_model_class("nlt")(cfg)
    assert model.has_stochastic_loss()
    assert model.feat_loss_indices() == []  # elpips gt is not cacheable

    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step = train_mod.make_train_step(model, tx, with_vis=False)

    rng = np.random.RandomState(0)

    def img(c):
        return rng.uniform(0, 1, (2, 32, 32, c)).astype(np.float32)

    xs, ys = np.meshgrid(np.arange(32), np.arange(32))
    warp = np.tile(
        np.stack([xs / 32, ys / 32], -1).astype(np.float32)[None],
        (2, 1, 1, 1))
    batch = {
        "base": img(3), "cvis": img(1), "lvis": img(1), "warp": warp,
        "rgb": img(3), "rgb_camspc": img(3), "nn_base": img(3),
        "nn_rgb": img(3), "nn_rgb_camspc": img(3),
    }
    state, l1 = step(state, batch)
    state, l2 = step(state, batch)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
