"""Data-layer integration tests: synthetic generation -> file-list JSON
-> dataset loading with holdout split, nn lookup, caching, and pipeline
collation (reference behaviors: nlt/datasets/nlt.py:54-100, 115-184)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from nlt_tpu.datasets import get_dataset_class
from nlt_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene") / "sphere")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "data_gen", "synthesize.py"),
         "--outroot", root, "--n_cams", "3", "--n_lights", "3",
         "--n_test", "2", "--imh", "32", "--uvs", "32"],
        check=True, capture_output=True)
    return root


def scene_config(scene_root, **overrides):
    cfg = {
        "dataset": "nlt", "model": "nlt", "loss": "l1",
        "imh": 32, "imw": 32, "uvh": 32, "uvw": 32,
        "use_obs": True, "skip_connect_base": True,
        "linear_space": False,
        "depth0": 16, "depth": 16, "kernel": 2, "stride": 2,
        "norm": "None", "act": "leakyrelu", "pool": "None",
        "bs": 2, "cache": False,
        "data_root": scene_root,
        "holdout_cam": "C02", "holdout_light": "L002",
    }
    cfg.update(overrides)
    return Config(cfg)


def test_file_list_contract(scene_root):
    fl = json.load(open(scene_root + ".json"))
    assert len(fl) == 9 + 2
    tv = [k for k in fl if k.startswith("trainvali_")]
    te = [k for k in fl if k.startswith("test_")]
    assert len(tv) == 9 and len(te) == 2
    assert all(fl[k]["complete"] for k in fl)
    for key in ("cam", "cvis", "diffuse", "light", "lvis", "nn", "uv2cam"):
        assert key in fl[tv[0]]
    for key in ("alpha", "rgb", "rgb_camspc"):
        assert key in fl[tv[0]]
        assert key not in fl[te[0]]


def test_holdout_split(scene_root):
    ds_train = get_dataset_class("nlt")(scene_config(scene_root), "train")
    ds_vali = get_dataset_class("nlt")(scene_config(scene_root), "vali")
    ds_test = get_dataset_class("nlt")(scene_config(scene_root), "test")
    # 3x3 product: holdout C02 x L002 -> 1 vali, 8 train
    assert len(ds_vali) == 1
    assert len(ds_train) == 8
    assert len(ds_test) == 2
    assert set(ds_train.files).isdisjoint(ds_vali.files)
    for id_ in ds_vali.files:
        assert id_.endswith("_C02_L002")


def test_load_item_contract(scene_root):
    ds = get_dataset_class("nlt")(scene_config(scene_root), "train")
    item = ds._load_item(sorted(ds.files)[0])
    assert item["base"].shape == (32, 32, 3)
    assert item["cvis"].shape == (32, 32, 1)
    assert item["lvis"].shape == (32, 32, 1)
    assert item["warp"].shape == (32, 32, 2)
    assert item["rgb"].shape == (32, 32, 3)
    assert item["rgb_camspc"].shape == (32, 32, 3)
    assert item["nn_base"].shape == (32, 32, 3)
    assert item["id"].startswith("trainvali_")
    assert item["nn_id"].startswith("trainvali_")
    # nn must reference a DIFFERENT (cam, light) config
    assert item["nn_id"] != item["id"]
    for k, v in item.items():
        if isinstance(v, np.ndarray):
            assert v.dtype == np.float32
            assert np.all(np.isfinite(v))


def test_multi_observation_loading(scene_root):
    """n_obs > 1 loads the k nearest observations (nn.json 'cams'/
    'lights' lists) stacked on a leading obs axis; obs 0 equals the
    legacy single-neighbor load."""
    ds1 = get_dataset_class("nlt")(scene_config(scene_root), "train")
    ds2 = get_dataset_class("nlt")(scene_config(scene_root, n_obs=2),
                                   "train")
    id_ = sorted(ds1.files)[0]
    one = ds1._load_item(id_)
    two = ds2._load_item(id_)
    assert two["nn_base"].shape == (2, 32, 32, 3)
    assert two["nn_rgb"].shape == (2, 32, 32, 3)
    assert two["nn_rgb_camspc"].shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(two["nn_base"][0], one["nn_base"])
    np.testing.assert_array_equal(two["nn_rgb"][0], one["nn_rgb"])
    ids = two["nn_id"].split(";")
    assert len(ids) == 2 and ids[0] == one["nn_id"]
    # The 2nd observation is a different real config (9 trainvali
    # configs exist, so the 2-NN list never clamps here).
    assert ids[1] != ids[0] and ids[1].startswith("trainvali_")
    assert not np.array_equal(two["nn_rgb"][1], two["nn_rgb"][0])

    # Pipeline collation stacks the obs axis after the batch axis.
    b = next(iter(ds2.iterate(seed=0)))
    assert b["nn_rgb"].shape == (2, 2, 32, 32, 3)


def test_multi_observation_model_forward(scene_root):
    """The model consumes stacked observations; with K identical
    observations the prediction equals the single-observation one
    (mean aggregation), and gradients flow."""
    import jax
    import jax.numpy as jnp

    from nlt_tpu.models import get_model_class

    cfg = scene_config(scene_root, n_obs=2)
    ds = get_dataset_class("nlt")(cfg, "train")
    model = get_model_class("nlt")(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = next(iter(ds.iterate(seed=0)))
    batch_arr = {k: jnp.asarray(v) for k, v in batch.items()
                 if not isinstance(v, list)}

    pred, gt, kwargs, _ = model.apply(params, batch_arr, "train")
    assert pred.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(pred)))

    # K duplicated observations == the single-observation path.
    dup = dict(batch_arr)
    dup["nn_base"] = jnp.stack([batch_arr["nn_base"][:, 0]] * 2, axis=1)
    dup["nn_rgb"] = jnp.stack([batch_arr["nn_rgb"][:, 0]] * 2, axis=1)
    single = dict(batch_arr)
    single["nn_base"] = batch_arr["nn_base"][:, 0]
    single["nn_rgb"] = batch_arr["nn_rgb"][:, 0]
    single["nn_rgb_camspc"] = batch_arr["nn_rgb_camspc"][:, 0]
    pred_dup, *_ = model.apply(params, dup, "train")
    pred_single, *_ = model.apply(params, single, "train")
    np.testing.assert_allclose(
        np.asarray(pred_dup), np.asarray(pred_single),
        rtol=1e-5, atol=1e-5)

    def loss_fn(p):
        pred, gt, kw, _ = model.apply(p, batch_arr, "train")
        kw["keep_batch"] = True
        return jnp.mean(model.compute_loss(p, pred, gt, **kw))

    grads = jax.grad(loss_fn)(params)
    gnorm = jnp.sqrt(sum(
        jnp.sum(jnp.square(g))
        for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_obs_weights_normalized_mean(scene_root):
    """_apply_unet's obs_weights are a NORMALIZED weighted mean: uniform
    weights reproduce the unweighted path regardless of their scale."""
    import jax
    import jax.numpy as jnp

    from nlt_tpu.models import get_model_class

    cfg = scene_config(scene_root, n_obs=2)
    ds = get_dataset_class("nlt")(cfg, "train")
    model = get_model_class("nlt")(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = next(iter(ds.iterate(seed=0)))
    x = jnp.concatenate(
        [jnp.asarray(batch["base"]), jnp.asarray(batch["cvis"]),
         jnp.asarray(batch["lvis"])], axis=3)
    y_obs = [jnp.asarray(batch["nn_rgb"][:, j] - batch["nn_base"][:, j])
             for j in range(2)]
    out_plain = model._apply_unet(params["net"], x, y_obs)
    # Uniform weights of arbitrary scale == unweighted mean.
    w = jnp.full((x.shape[0], 2), 7.0)
    out_w = model._apply_unet(params["net"], x, y_obs, obs_weights=w)
    np.testing.assert_allclose(
        np.asarray(out_w), np.asarray(out_plain), rtol=1e-5, atol=1e-5)


def test_obs_fold_matches_unrolled(scene_root):
    """The folded multi-observation path (K observations batched into
    the obs path's batch axis, one conv per stage — SURVEY §7 M5's
    light/view-pair scaling, TPU-native form) equals the unrolled
    per-observation loop, with and without distance weights."""
    import jax
    import jax.numpy as jnp

    from nlt_tpu.models import get_model_class

    batch_arr = None
    preds = {}
    for weighting in ("none", "inverse_distance"):
        for fold in (True, False):
            cfg = scene_config(scene_root, n_obs=2, obs_fold=fold,
                               obs_weighting=weighting)
            model = get_model_class("nlt")(cfg)
            if batch_arr is None:
                ds = get_dataset_class("nlt")(
                    scene_config(scene_root, n_obs=2,
                                 obs_weighting="inverse_distance"),
                    "train")
                batch = next(iter(ds.iterate(seed=0)))
                batch_arr = {k: jnp.asarray(v) for k, v in batch.items()
                             if not isinstance(v, list)}
                params = model.init_params(jax.random.PRNGKey(0))
            pred, *_ = model.apply(params, batch_arr, "train")
            preds[(weighting, fold)] = np.asarray(pred)
    for weighting in ("none", "inverse_distance"):
        np.testing.assert_allclose(
            preds[(weighting, True)], preds[(weighting, False)],
            rtol=1e-5, atol=1e-6, err_msg=weighting)
    # Sanity: weighting changes the result (distances are unequal).
    assert not np.allclose(preds[("none", True)],
                           preds[("inverse_distance", True)])


def test_obs_weighting_respects_disk_cache_identity(scene_root):
    """Enabling obs_weighting after a cache=disk run must NOT hit the
    stale blobs written without nn_dist (the weighted run would
    silently fall back to the flat mean): the knob is part of the
    disk-cache identity (code-review r3 finding)."""
    ds_plain = get_dataset_class("nlt")(
        scene_config(scene_root, n_obs=2, cache="disk"), "train")
    b_plain = next(iter(ds_plain.iterate(seed=0)))
    assert "nn_dist" not in b_plain

    ds_w = get_dataset_class("nlt")(
        scene_config(scene_root, n_obs=2, cache="disk",
                     obs_weighting="inverse_distance"), "train")
    assert ds_w._disk_cache_dir != ds_plain._disk_cache_dir
    b_w = next(iter(ds_w.iterate(seed=0)))
    assert "nn_dist" in b_w and b_w["nn_dist"].shape == (2, 2)


def test_obs_fold_default_off_for_batchnorm(scene_root):
    """Folded BatchNorm would couple observations through the (N*K)
    batch statistics, so norm=batch defaults to the unrolled path;
    bf16 compute keeps the 1/d weights in the compute dtype (no silent
    f32 promotion of the query U-Net)."""
    import jax
    import jax.numpy as jnp

    from nlt_tpu.models import get_model_class

    m_bn = get_model_class("nlt")(
        scene_config(scene_root, n_obs=2, norm="batch"))
    assert m_bn.obs_fold is False
    # Default off everywhere (measured slower at flagship shapes —
    # tools/bench_obs_fold.py); explicit opt-in works.
    m_plain = get_model_class("nlt")(scene_config(scene_root, n_obs=2))
    assert m_plain.obs_fold is False
    m_fold = get_model_class("nlt")(
        scene_config(scene_root, n_obs=2, obs_fold=True))
    assert m_fold.obs_fold is True

    # bf16 + weighting: obs_weights are cast to the compute dtype so
    # the weighted aggregate (and the concat consuming it) stays bf16.
    cfg = scene_config(scene_root, n_obs=2,
                       obs_weighting="inverse_distance",
                       compute_dtype="bfloat16")
    ds = get_dataset_class("nlt")(cfg, "train")
    model = get_model_class("nlt")(cfg)
    batch = next(iter(ds.iterate(seed=0)))
    arrays = {k: jnp.asarray(v) for k, v in batch.items()
              if not isinstance(v, list)}
    params = model.init_params(jax.random.PRNGKey(0))

    captured = {}
    orig = model._apply_unet

    def spy(net_params, x, obs_xs, obs_weights=None, obs_override=None):
        captured["w_dtype"] = (None if obs_weights is None
                               else obs_weights.dtype)
        return orig(net_params, x, obs_xs, obs_weights=obs_weights,
                    obs_override=obs_override)

    model._apply_unet = spy
    pred, *_ = model.apply(params, arrays, "train")
    assert captured["w_dtype"] == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(pred, np.float32)))


def test_obs_weighting_inverse_distance(scene_root):
    """obs_weighting = inverse_distance: the dataset emits per-
    observation (cam, light) distances from the config JSON positions,
    and the model aggregates the obs features by 1/d weights — equal
    distances reproduce the flat mean, unequal ones tilt the output
    toward the nearer observation (VERDICT r2 #6: wire obs_weights)."""
    import jax
    import jax.numpy as jnp

    from nlt_tpu.models import get_model_class

    cfg = scene_config(scene_root, n_obs=2,
                       obs_weighting="inverse_distance")
    ds = get_dataset_class("nlt")(cfg, "train")
    item = ds._load_item(sorted(ds.files)[0])
    assert item["nn_dist"].shape == (2,)
    assert item["nn_dist"].dtype == np.float32
    assert np.all(item["nn_dist"] > 0)
    # The list is nearest-first, so distances are non-decreasing.
    assert item["nn_dist"][0] <= item["nn_dist"][1]

    batch = next(iter(ds.iterate(seed=0)))
    assert batch["nn_dist"].shape == (2, 2)
    batch_arr = {k: jnp.asarray(v) for k, v in batch.items()
                 if not isinstance(v, list)}
    model = get_model_class("nlt")(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pred_w, *_ = model.apply(params, batch_arr, "train")
    assert np.all(np.isfinite(np.asarray(pred_w)))

    # Equal distances == the unweighted mean path.
    eq = dict(batch_arr, nn_dist=jnp.full((2, 2), 3.0))
    pred_eq, *_ = model.apply(params, eq, "train")
    plain = get_model_class("nlt")(scene_config(scene_root, n_obs=2))
    pred_plain, *_ = plain.apply(
        params, {k: v for k, v in batch_arr.items() if k != "nn_dist"},
        "train")
    np.testing.assert_allclose(
        np.asarray(pred_eq), np.asarray(pred_plain),
        rtol=1e-5, atol=1e-5)

    # Unequal distances change the prediction (the weights are live)
    # unless the two observations happen to be identical.
    uneq = dict(batch_arr, nn_dist=jnp.asarray(
        [[0.1, 10.0], [0.1, 10.0]], jnp.float32))
    pred_uneq, *_ = model.apply(params, uneq, "train")
    obs_differ = not np.allclose(
        np.asarray(batch_arr["nn_rgb"][:, 0]),
        np.asarray(batch_arr["nn_rgb"][:, 1]))
    if obs_differ:
        assert not np.allclose(
            np.asarray(pred_uneq), np.asarray(pred_eq))


def test_warp_range_and_background(scene_root):
    ds = get_dataset_class("nlt")(scene_config(scene_root), "train")
    item = ds._load_item(sorted(ds.files)[0])
    warp = item["warp"]
    assert warp.min() >= 0.0 and warp.max() <= 1.0
    # Some background pixels must be exactly 0 (the corner trick)
    assert (np.all(warp == 0, axis=-1)).sum() > 0


def test_test_mode_placeholders(scene_root):
    ds = get_dataset_class("nlt")(scene_config(scene_root), "test")
    item = ds._load_item(sorted(ds.files)[0])
    np.testing.assert_array_equal(item["rgb"], 0)
    np.testing.assert_array_equal(item["rgb_camspc"], 0)


def test_pipeline_batches(scene_root):
    ds = get_dataset_class("nlt")(scene_config(scene_root), "train")
    batches = list(ds.iterate(seed=0))
    assert len(batches) == 4  # 8 examples / bs 2
    b = batches[0]
    assert b["base"].shape == (2, 32, 32, 3)
    assert isinstance(b["id"], list) and len(b["id"]) == 2
    # Epoch reshuffling changes order
    order0 = [i for b in ds.iterate(seed=0) for i in b["id"]]
    order1 = [i for b in ds.iterate(seed=1) for i in b["id"]]
    assert order0 != order1
    assert sorted(order0) == sorted(order1)
    # vali/test not shuffled
    ds_test = get_dataset_class("nlt")(scene_config(scene_root), "test")
    t0 = [i for b in ds_test.iterate(seed=0) for i in b["id"]]
    t1 = [i for b in ds_test.iterate(seed=5) for i in b["id"]]
    assert t0 == t1 == sorted(t0)


def test_iterate_sharded_geometry(scene_root):
    """Sharded hosts must agree on batch count and per-host batch size
    even when len(ids) doesn't divide: geometry is derived globally."""
    ds = get_dataset_class("nlt")(scene_config(scene_root), "train")
    assert len(ds) == 8  # bs 2, 2 shards -> 4 global batches of 1/host
    per_shard = []
    for shard in (0, 1):
        batches = list(ds.iterate(seed=3, shard_id=shard, num_shards=2))
        per_shard.append(batches)
    assert len(per_shard[0]) == len(per_shard[1]) == 4
    for b0, b1 in zip(*per_shard):
        assert b0["base"].shape[0] == b1["base"].shape[0] == 1
        # Disjoint example sets per host, same global batch.
        assert set(b0["id"]).isdisjoint(b1["id"])
    # Union over both hosts covers every example exactly once.
    seen = [i for bs_ in per_shard for b in bs_ for i in b["id"]]
    assert sorted(seen) == sorted(ds.files)


def test_cache_returns_same_data(scene_root):
    cfg = scene_config(scene_root, cache=True)
    ds = get_dataset_class("nlt")(cfg, "train")
    b1 = next(iter(ds.iterate(seed=0)))
    b2 = next(iter(ds.iterate(seed=0)))
    np.testing.assert_array_equal(b1["base"], b2["base"])
    assert len(ds._cache) > 0


def test_missing_file_list_raises(tmp_path):
    cfg = scene_config(str(tmp_path / "nonexistent"))
    with pytest.raises(FileNotFoundError):
        get_dataset_class("nlt")(cfg, "train")


def test_incomplete_config_skipped(scene_root, tmp_path):
    """IDs flagged incomplete are excluded
    (reference: nlt/datasets/nlt.py:63-68)."""
    fl = json.load(open(scene_root + ".json"))
    some_id = sorted(k for k in fl if k.startswith("trainvali_"))[0]
    fl[some_id]["complete"] = False
    mod_root = str(tmp_path / "modscene")
    os.symlink(scene_root, mod_root)
    with open(mod_root + ".json", "w") as h:
        json.dump(fl, h)
    ds = get_dataset_class("nlt")(scene_config(mod_root), "train")
    assert some_id not in ds.files
    assert len(ds) == 7


def test_multi_scene(scene_root, tmp_path_factory):
    """Comma-separated data_root trains over multiple scenes with
    scene-local neighbor lookups (no reference counterpart)."""
    root2 = str(tmp_path_factory.mktemp("scene2") / "sphere_sss")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "data_gen", "synthesize.py"),
         "--outroot", root2, "--n_cams", "2", "--n_lights", "2",
         "--n_test", "1", "--imh", "32", "--uvs", "32", "--sss"],
        check=True, capture_output=True)
    cfg = scene_config(scene_root)
    cfg.set("data_root", scene_root + "," + root2)
    ds = get_dataset_class("nlt")(cfg, "train")
    # 8 from scene one (9 - 1 holdout) + 4 from scene two (no holdout hit)
    assert len(ds) == 12
    scenes = {i.split("/")[0] for i in ds.files}
    assert scenes == {"sphere", "sphere_sss"}
    item = ds._load_item([f for f in ds.files
                          if f.startswith("sphere_sss/")][0])
    # Neighbor resolved within the same scene
    assert item["nn_id"].startswith("sphere_sss/")
    assert item["base"].shape == (32, 32, 3)


def test_disk_cache(scene_root):
    """cache=disk packs examples as blobs; second epoch loads from
    cache with quantization error <= 1/255 on image fields."""
    cfg = scene_config(scene_root, cache="disk")
    ds = get_dataset_class("nlt")(cfg, "train")
    b1 = next(iter(ds.iterate(seed=0)))
    # cache files written
    import glob as g
    cache_files = g.glob(scene_root.rstrip("/") + "_cache/train_uv32_im32/*.blob")
    assert cache_files
    ds2 = get_dataset_class("nlt")(cfg, "train")
    b2 = next(iter(ds2.iterate(seed=0)))
    assert b1["id"] == b2["id"]
    np.testing.assert_allclose(b1["base"], b2["base"], atol=1.01 / 255)
    np.testing.assert_allclose(b1["warp"], b2["warp"], atol=1e-3)


def test_device_normalize_uint8_pipeline(scene_root):
    """device_normalize ships uint8 images + f16 warp; the model
    normalizes on device and predictions match the f32 pipeline to
    quantization error."""
    import jax
    from nlt_tpu.models import get_model_class

    cfg32 = scene_config(scene_root)
    cfg8 = scene_config(scene_root, device_normalize=True)
    ds32 = get_dataset_class("nlt")(cfg32, "train")
    ds8 = get_dataset_class("nlt")(cfg8, "train")
    b32 = next(iter(ds32.iterate(seed=0)))
    b8 = next(iter(ds8.iterate(seed=0)))
    assert b8["base"].dtype == np.uint8
    assert b8["warp"].dtype == np.float16
    assert b32["base"].dtype == np.float32

    model = get_model_class("nlt")(cfg32)
    params = model.init_params(jax.random.PRNGKey(0))

    def run(b):
        arrays = {k: v for k, v in b.items() if not isinstance(v, list)}
        pred, gt, _, _ = model.apply(params, arrays, "train")
        return np.asarray(pred)

    p32 = run(b32)
    p8 = run(b8)
    assert b32["id"] == b8["id"]
    np.testing.assert_allclose(p8, p32, atol=0.02)


def test_blob_fast_path_hit_and_exact(scene_root, tmp_path, monkeypatch):
    """Warm epochs stream blobs straight into batch slots
    (`_blob_read_into`), byte-identical to the slow loader path."""
    import shutil

    root = str(tmp_path / "blobscene")
    shutil.copytree(scene_root, root)
    shutil.copy(scene_root + ".json", root + ".json")
    cfg = scene_config(root, cache="disk", device_normalize=True)
    ds = get_dataset_class("nlt")(cfg, "train")
    # Drain the cold epoch completely so every blob is written and the
    # producer thread has exited before patching the class method.
    slow = list(ds.iterate(seed=0))[0]

    hits = []
    orig = type(ds)._blob_read_into

    def counting(self, id_, arrays, strs, i):
        ok = orig(self, id_, arrays, strs, i)
        hits.append(ok)
        return ok

    monkeypatch.setattr(type(ds), "_blob_read_into", counting)
    fast = next(iter(ds.iterate(seed=0)))
    assert hits and all(hits), "warm batch should hit the blob fast path"
    for k in slow:
        if isinstance(slow[k], np.ndarray):
            assert slow[k].dtype == fast[k].dtype
            np.testing.assert_array_equal(slow[k], fast[k])
        else:
            assert slow[k] == fast[k]


def test_blob_stale_cache_fallback(scene_root, tmp_path):
    """A blob written at a different resolution is rejected (shape check)
    and regenerated by the slow path instead of delivering wrong data."""
    import shutil

    root = str(tmp_path / "stalescene")
    shutil.copytree(scene_root, root)
    shutil.copy(scene_root + ".json", root + ".json")
    cfg16 = scene_config(root, cache="disk", uvh=16, uvw=16, imh=16,
                         imw=16)
    ds16 = get_dataset_class("nlt")(cfg16, "train")
    next(iter(ds16.iterate(seed=0)))

    # Same cache dir name would need same uvh; simulate staleness by
    # corrupting a blob payload header instead.
    cache_dir = root.rstrip("/") + "_cache/train_uv16_im16"
    blobs = sorted(os.listdir(cache_dir))
    assert blobs
    victim = os.path.join(cache_dir, blobs[0])
    with open(victim, "r+b") as h:
        h.write(b"JUNK")  # clobber magic
    ds_again = get_dataset_class("nlt")(cfg16, "train")
    batch = next(iter(ds_again.iterate(seed=0)))
    assert batch["base"].shape[1:] == (16, 16, 3)
    # The corrupted blob was rewritten by the fallback.
    with open(victim, "rb") as h:
        assert h.read(4) == b"NLTB"
