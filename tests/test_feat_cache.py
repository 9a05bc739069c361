"""GT loss-feature caching: the LPIPS gt branch is static per example,
so cached-taps training must reproduce the plain path exactly
(parallel/feat_cache.py, losses.LPIPS gt_feats)."""

import jax
import numpy as np
import pytest

from nlt_tpu.models import get_model_class
from nlt_tpu.parallel import feat_cache as feat_cache_mod
from nlt_tpu.parallel import train as train_mod
from nlt_tpu.utils.config import Config

RES = 32


def small_config(**overrides):
    cfg = {
        "dataset": "nlt", "model": "nlt", "loss": "barron,1e+0lpips",
        "imh": RES, "imw": RES, "uvh": RES, "uvw": RES,
        "use_obs": True, "skip_connect_base": True,
        "linear_space": False,
        "depth0": 16, "depth": 16, "kernel": 2, "stride": 2,
        "norm": "None", "act": "leakyrelu", "pool": "None",
        "bs": 2,
    }
    cfg.update(overrides)
    return Config(cfg)


def make_batch(n=2, seed=0):
    rng = np.random.RandomState(seed)

    def img(c):
        return rng.uniform(0, 1, (n, RES, RES, c)).astype(np.float32)

    xs, ys = np.meshgrid(np.arange(RES), np.arange(RES))
    warp = np.stack([xs / RES, ys / RES], -1).astype(np.float32)
    return {
        "base": img(3), "cvis": img(1), "lvis": img(1),
        "warp": np.tile(warp[None], (n, 1, 1, 1)),
        "rgb": img(3), "rgb_camspc": img(3),
        "nn_base": img(3), "nn_rgb": img(3), "nn_rgb_camspc": img(3),
    }


@pytest.fixture(scope="module")
def setup():
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch()
    return model, tx, batch


def test_gt_camspc_matches_apply(setup):
    """The net-free gt computation equals apply()'s gt output."""
    model, _, batch = setup
    params = model.init_params(jax.random.PRNGKey(0))
    _, gt_apply, _, _ = model.apply(params, batch, "train")
    gt_static = model.gt_camspc(batch)
    np.testing.assert_array_equal(
        np.asarray(gt_apply), np.asarray(gt_static))


def test_cached_step_matches_plain(setup):
    """One cached-statics training step == one plain step: same loss,
    same updated params."""
    model, tx, batch = setup
    key = jax.random.PRNGKey(1)
    s_plain = train_mod.init_state(model, tx, key)
    s_cached = train_mod.init_state(model, tx, key)

    step_plain = train_mod.make_train_step(model, tx, with_vis=False)
    step_cached = train_mod.make_train_step(
        model, tx, with_vis=False, cached_statics=True)
    extract = train_mod.make_static_extractor(model)

    feats = extract(s_cached["params"], batch)
    assert set(feats) == {"feats", "products"}
    assert set(feats["feats"]) == {
        str(i) for i in model.feat_loss_indices()}
    assert set(feats["products"]) == {
        "gt_camspc", "base_camspc", "pred_plan"}

    s_plain, l_plain = step_plain(s_plain, batch)
    s_cached, l_cached = step_cached(s_cached, batch, feats)
    # The cached warp products equal apply()'s inline computation.
    prods = model.static_products(batch)
    _, gt_apply, _, to_vis = model.apply(
        s_plain["params"], batch, "train")
    np.testing.assert_array_equal(
        np.asarray(prods["gt_camspc"]), np.asarray(gt_apply))
    np.testing.assert_array_equal(
        np.asarray(prods["base_camspc"]),
        np.asarray(to_vis["base_camspc"]))

    np.testing.assert_allclose(
        float(l_plain), float(l_cached), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_plain["params"]),
                    jax.tree_util.tree_leaves(s_cached["params"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_feat_cache_roundtrip(setup):
    """Insert then gather returns the inserted features, in id order."""
    model, _, batch = setup
    params = model.init_params(jax.random.PRNGKey(0))
    extract = train_mod.make_static_extractor(model)
    feats = extract(params, batch)["feats"]

    ids = ["ex_b", "ex_a", "ex_c", "ex_d"]
    cache = feat_cache_mod.GTFeatureCache(ids)
    assert not cache.has_all(["ex_b"])
    cache.insert(["ex_b", "ex_a"], feats)
    assert cache.has_all(["ex_a", "ex_b"])
    assert not cache.has_all(["ex_a", "ex_c"])

    got = cache.gather(["ex_a", "ex_b"])
    for k in feats:
        for tap_in, tap_out in zip(feats[k], got[k]):
            # inserted [b, a] -> gathered [a, b]
            np.testing.assert_array_equal(
                np.asarray(tap_out[0]), np.asarray(tap_in[1]))
            np.testing.assert_array_equal(
                np.asarray(tap_out[1]), np.asarray(tap_in[0]))


def test_missing_id_raises(setup):
    model, _, batch = setup
    cache = feat_cache_mod.GTFeatureCache(["only_id"])
    with pytest.raises(KeyError):
        cache.gather(["unknown"])


def test_capacity_cap_partial_caching(setup):
    """cache_static_mb caps the preallocated table: slots fill
    first-come, capacity-exceeding examples stay uncached (insert
    returns False, has_all False), and cached slots still gather the
    exact inserted values — the driver then feeds fresh extractions
    for the uncached rows (trainvali)."""
    model, _, batch = setup
    params = model.init_params(jax.random.PRNGKey(0))
    extract = train_mod.make_static_extractor(model)
    statics = extract(params, batch)
    per_ex = sum(
        f.nbytes for f in jax.tree_util.tree_leaves(statics)) // 2

    ids = ["e%d" % i for i in range(4)]
    # Cap fits exactly 2 examples of the 4 (byte-precise for the test;
    # the config knob is MB-granular).
    cache = feat_cache_mod.GTFeatureCache(ids, cap_mb=0)
    cache.cap_bytes = 2 * per_ex
    assert cache.insert(["e0", "e1"], statics)
    assert cache.has_all(["e0", "e1"])
    assert cache.n_slots < len(ids)
    # Beyond capacity: partial insert, has_all stays False.
    assert not cache.insert(["e2", "e3"], statics)
    assert not cache.has_all(["e2"])
    got = cache.gather(["e1", "e0"])
    want = statics
    a = jax.tree_util.tree_leaves(got)
    b = jax.tree_util.tree_leaves(want)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(
            np.asarray(x[0]), np.asarray(y[1]))
        np.testing.assert_array_equal(
            np.asarray(x[1]), np.asarray(y[0]))


def test_capacity_zero_streams(setup):
    model, _, batch = setup
    params = model.init_params(jax.random.PRNGKey(0))
    extract = train_mod.make_static_extractor(model)
    statics = extract(params, batch)
    cache = feat_cache_mod.GTFeatureCache(["a", "b"], cap_mb=0)
    assert not cache.insert(["a", "b"], statics)
    assert not cache.has_all(["a"])
