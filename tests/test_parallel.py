"""Distribution tests on the 8-device CPU mesh: data-parallel and
texel-tile-sharded train steps compile and execute, losses match the
single-device result, and state stays replicated (the TPU-native
replacement for MirroredStrategy, SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.models import get_model_class
from nlt_tpu.parallel import mesh as mesh_mod
from nlt_tpu.parallel import train as train_mod
from nlt_tpu.utils.config import Config

UVH = 32


def small_config(**overrides):
    cfg = {
        "dataset": "nlt", "model": "nlt", "loss": "l1",
        "imh": UVH, "imw": UVH, "uvh": UVH, "uvw": UVH,
        "use_obs": True, "skip_connect_base": True,
        "linear_space": False,
        "depth0": 16, "depth": 16, "kernel": 2, "stride": 2,
        "norm": "None", "act": "leakyrelu", "pool": "None",
        "bs": 8,
    }
    cfg.update(overrides)
    return Config(cfg)


def make_batch(rng, n=8, size=UVH):
    def img(c):
        return rng.uniform(0, 1, (n, size, size, c)).astype(np.float32)

    xs, ys = np.meshgrid(np.arange(size), np.arange(size))
    warp = np.stack([xs / size, ys / size], -1).astype(np.float32)
    return {
        "base": img(3), "cvis": img(1), "lvis": img(1),
        "warp": np.tile(warp[None], (n, 1, 1, 1)),
        "rgb": img(3), "rgb_camspc": img(3),
        "nn_base": img(3), "nn_rgb": img(3), "nn_rgb_camspc": img(3),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices")


def test_mesh_shapes():
    mesh = mesh_mod.make_mesh()
    assert mesh.shape == {"data": 8, "tile": 1}
    mesh2 = mesh_mod.make_mesh(n_tile=4)
    assert mesh2.shape == {"data": 2, "tile": 4}
    with pytest.raises(AssertionError):
        mesh_mod.make_mesh(n_data=3, n_tile=3)


def test_data_parallel_step_matches_single_device(rng):
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch(rng)

    # Single-device reference
    state1 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step1 = train_mod.make_train_step(model, tx)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    state1, loss1, _ = step1(state1, arrays)

    # 8-way data-parallel
    mesh = mesh_mod.make_mesh()
    state8 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    state8 = jax.device_put(state8, mesh_mod.replicated(mesh))
    step8 = train_mod.make_train_step(model, tx, mesh=mesh)
    sharded = mesh_mod.shard_batch(mesh, batch)
    state8, loss8, to_vis = step8(state8, sharded)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    # Updated parameters identical
    p1 = jax.tree.leaves(state1["params"]["net"])
    p8 = jax.tree.leaves(state8["params"]["net"])
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5)
    # Vis outputs batch-sharded but globally correct
    assert to_vis["pred"].shape[0] == 8


def test_texel_tile_sharded_step(rng):
    """2 data x 4 tile: UV rows sharded across chips; XLA inserts conv
    halo exchanges. Loss must match the unsharded run."""
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch(rng)

    state1 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step1 = train_mod.make_train_step(model, tx)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    _, loss1, _ = step1(state1, arrays)

    mesh = mesh_mod.make_mesh(n_tile=4)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    step = train_mod.make_train_step(
        model, tx, mesh=mesh, tile_spatial=True)
    sharded = mesh_mod.shard_batch(mesh, batch, tile_spatial=True)
    _, loss_t, _ = step(state, sharded)
    np.testing.assert_allclose(float(loss1), float(loss_t), rtol=1e-4)


def test_deep_pyramid_tile_sharding_128(rng):
    """Deep-pyramid tile sharding (VERDICT r3 #4): the FULL depth0=16
    dragon schedule (depth 256 -> five contracting stages, a 4x4
    bottleneck at 128^2) under texel-tile sharding. tile=2 leaves 2
    bottleneck rows per shard; tile=8 EXCEEDS the bottleneck's 4 rows
    entirely — GSPMD pads the degenerate shards and the result is
    still exact (the supported envelope documented in
    parallel/mesh.py). Losses must match single-device at rtol 1e-5."""
    size = 128
    cfg = small_config(imh=size, imw=size, uvh=size, uvw=size,
                       depth=256, bs=4)
    model = get_model_class("nlt")(cfg)
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch(rng, n=4, size=size)

    state1 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step1 = train_mod.make_train_step(model, tx)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    _, loss1, _ = step1(state1, arrays)

    for n_tile in (2, 8):
        mesh = mesh_mod.make_mesh(n_data=1, n_tile=n_tile)
        state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
        state = jax.device_put(state, mesh_mod.replicated(mesh))
        step = train_mod.make_train_step(
            model, tx, mesh=mesh, tile_spatial=True)
        sharded = mesh_mod.shard_batch(mesh, batch, tile_spatial=True)
        _, loss_t, _ = step(state, sharded)
        np.testing.assert_allclose(
            float(loss1), float(loss_t), rtol=1e-5,
            err_msg="n_tile=%d" % n_tile)


def test_multi_observation_tile_sharded_step(rng):
    """Multi-observation batches (5-D nn fields) shard rows on 'tile'
    with the obs axis intact; loss matches the unsharded run."""
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch(rng)
    k_obs = 2
    for f in ("nn_base", "nn_rgb", "nn_rgb_camspc"):
        batch[f] = np.stack(
            [batch[f], np.roll(batch[f], 1, axis=0)], axis=1)
        assert batch[f].shape[1] == k_obs

    state1 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step1 = train_mod.make_train_step(model, tx)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    _, loss1, _ = step1(state1, arrays)

    mesh = mesh_mod.make_mesh(n_tile=4)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    step = train_mod.make_train_step(
        model, tx, mesh=mesh, tile_spatial=True)
    sharded = mesh_mod.shard_batch(mesh, batch, tile_spatial=True)
    _, loss_t, _ = step(state, sharded)
    np.testing.assert_allclose(float(loss1), float(loss_t), rtol=1e-4)


def test_eval_step_sharded(rng):
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    mesh = mesh_mod.make_mesh()
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    eval_step = train_mod.make_eval_step(model, mesh=mesh)
    batch = mesh_mod.shard_batch(mesh, make_batch(rng))
    loss, to_vis = eval_step(state, batch)
    assert np.isfinite(float(loss))
    assert to_vis["pred_camspc"].shape == (8, UVH, UVH, 3)


def test_global_batch_from_local(rng):
    """Single-process path of the multi-host batch assembly."""
    mesh = mesh_mod.make_mesh()
    batch = make_batch(rng)
    global_batch = mesh_mod.make_global_batch(mesh, batch)
    assert global_batch["base"].shape == (8, UVH, UVH, 3)
    np.testing.assert_allclose(
        np.asarray(global_batch["base"]), batch["base"])


def test_grad_accum_matches_full_batch(rng):
    """grad_accum=2 produces the same loss, updated params, and vis
    (in original batch order) as the plain full-batch step — the mean
    gradient is grouping-invariant."""
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch(rng)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}

    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step = train_mod.make_train_step(model, tx)
    state_full, loss_full, vis_full = step(state, arrays)

    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step_acc = train_mod.make_train_step(model, tx, grad_accum=2)
    state_acc, loss_acc, vis_acc = step_acc(state, arrays)

    np.testing.assert_allclose(float(loss_full), float(loss_acc),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_full["params"]),
                    jax.tree.leaves(state_acc["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    # Vis re-assembled in original batch order (inverts the strided
    # microbatch split).
    np.testing.assert_allclose(
        np.asarray(vis_full["pred"]), np.asarray(vis_acc["pred"]),
        atol=1e-6)


def test_grad_accum_cached_statics(rng):
    """grad_accum composes with the static-products cache: statics are
    split along the same microbatch axis as the batch."""
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch(rng)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}

    state0 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    extract = train_mod.make_static_extractor(model)
    statics = extract(state0["params"], arrays)

    step_plain = train_mod.make_train_step(
        model, tx, cached_statics=True)
    state_p, loss_p, _ = step_plain(
        train_mod.init_state(model, tx, jax.random.PRNGKey(0)),
        arrays, statics)

    step_acc = train_mod.make_train_step(
        model, tx, cached_statics=True, grad_accum=4)
    state_a, loss_a, _ = step_acc(
        train_mod.init_state(model, tx, jax.random.PRNGKey(0)),
        arrays, statics)

    np.testing.assert_allclose(float(loss_p), float(loss_a), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_p["params"]),
                    jax.tree.leaves(state_a["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_grad_accum_data_parallel(rng):
    """grad_accum under the 'data' mesh: microbatches stay block-local
    to their devices (strided split) and the result matches the
    single-device full-batch step."""
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch(rng)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}

    state1 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    step1 = train_mod.make_train_step(model, tx)
    state1, loss1, _ = step1(state1, arrays)

    # micro batch = 8/2 = 4 -> clamp the data axis to 4 devices.
    mesh = mesh_mod.make_mesh(batch_size=4)
    assert mesh.shape["data"] == 4
    state8 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    state8 = jax.device_put(state8, mesh_mod.replicated(mesh))
    step8 = train_mod.make_train_step(model, tx, mesh=mesh, grad_accum=2)
    sharded = mesh_mod.shard_batch(mesh, batch)
    state8, loss8, _ = step8(state8, sharded)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state1["params"]),
                    jax.tree.leaves(state8["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_nan_guard_skips_bad_update(rng):
    """A batch that produces a non-finite loss leaves params/opt_state
    untouched under nan_guard=True (and poisons them without it)."""
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-3)
    batch = make_batch(rng)
    bad = dict(batch)
    # NaN in the diffuse base reaches the net input AND the residual
    # skip: loss and gradients both go non-finite.
    bad["base"] = np.full_like(batch["base"], np.nan)
    arrays = {k: jnp.asarray(v) for k, v in bad.items()}

    state0 = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    p0 = jax.tree.map(np.asarray, state0["params"])

    step_guarded = train_mod.make_train_step(model, tx, nan_guard=True)
    state_g, loss_g, _ = step_guarded(
        train_mod.init_state(model, tx, jax.random.PRNGKey(0)), arrays)
    assert not np.isfinite(float(loss_g))  # the event stays visible
    assert int(state_g["step"]) == 1
    for a, b in zip(jax.tree.leaves(p0),
                    jax.tree.leaves(state_g["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step_plain = train_mod.make_train_step(model, tx)
    state_p, _, _ = step_plain(
        train_mod.init_state(model, tx, jax.random.PRNGKey(0)), arrays)
    assert any(not np.all(np.isfinite(np.asarray(leaf)))
               for leaf in jax.tree.leaves(state_p["params"]))

    # A good batch under the guard still updates.
    good = {k: jnp.asarray(v) for k, v in batch.items()}
    state_g2, loss2, _ = step_guarded(state_g, good)
    assert np.isfinite(float(loss2))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0),
                        jax.tree.leaves(state_g2["params"])))
    assert changed


def test_ema_params_track_updates(rng):
    """state['ema_params'] = d*ema + (1-d)*params after each step, and
    eval_step consumes the EMA weights."""
    model = get_model_class("nlt")(small_config())
    tx = train_mod.make_optimizer(1e-2)
    batch = make_batch(rng)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    d = 0.9

    state = train_mod.init_state(
        model, tx, jax.random.PRNGKey(0), ema_decay=d)
    p0 = jax.tree.map(np.asarray, state["params"])
    step = train_mod.make_train_step(model, tx, ema_decay=d)
    state, _, _ = step(state, arrays)

    for e, a, b in zip(jax.tree.leaves(state["ema_params"]),
                       jax.tree.leaves(p0),
                       jax.tree.leaves(state["params"])):
        np.testing.assert_allclose(
            np.asarray(e), d * np.asarray(a) + (1 - d) * np.asarray(b),
            rtol=1e-5, atol=1e-7)

    # Eval consumes the EMA: with ema_params forced to the INITIAL
    # params, eval must match a no-EMA state holding those params.
    eval_step = train_mod.make_eval_step(model)
    state_forced = dict(state, ema_params=jax.tree.map(
        jnp.asarray, p0))
    loss_forced, _ = eval_step(state_forced, arrays)
    state_plain = train_mod.init_state(
        model, tx, jax.random.PRNGKey(0))
    loss_init, _ = eval_step(state_plain, arrays)
    np.testing.assert_allclose(
        float(loss_forced), float(loss_init), rtol=1e-6)


def test_scatter_partitioning_fast_and_fallback(rng):
    """The Pallas scatter's custom_partitioning: batch-sharded inputs
    take the per-shard kernel path; odd shardings (group dim unsharded,
    e.g. sharded along the row dim instead) fall back to a replicated
    call — both produce np.add.at's result (VERDICT r1: pin that the
    fallback engages rather than crashes)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nlt_tpu.ops import scatter_pallas

    n_groups, rows_g, per_g, w = 8, 16, 24, 8
    idx = np.concatenate([
        rng.randint(0, rows_g, per_g) + g * rows_g
        for g in range(n_groups)]).astype(np.int32)
    upd = rng.standard_normal((n_groups * per_g, w)).astype(np.float32)
    want = np.zeros((n_groups * rows_g, w), np.float32)
    np.add.at(want, idx, upd)

    mesh = mesh_mod.make_mesh()

    def run(idx_spec, upd_spec):
        idx2 = jax.device_put(
            idx.reshape(n_groups, per_g),
            NamedSharding(mesh, idx_spec))
        upd3 = jax.device_put(
            upd.reshape(n_groups, per_g, w),
            NamedSharding(mesh, upd_spec))
        out = jax.jit(
            lambda i2, u3: scatter_pallas.scatter_add_rows(
                i2.reshape(-1), u3.reshape(-1, w),
                n_groups * rows_g, n_groups))(idx2, upd3)
        return np.asarray(out)

    # Fast path: group dim sharded over 'data' (8 groups / 8 devices).
    np.testing.assert_allclose(
        run(P("data", None), P("data", None, None)), want, rtol=1e-6)
    # Fallback: sharded along the ROW dim — the partition rule finds no
    # usable group-dim axis and must run replicated, still correctly.
    np.testing.assert_allclose(
        run(P(None, "data"), P(None, "data", None)), want, rtol=1e-6)

    # Unit-pin the rule itself: a row-dim sharding yields replicated
    # arg/result shardings (shards=1).
    from types import SimpleNamespace
    arg_shapes = (
        SimpleNamespace(shape=(n_groups, per_g),
                        sharding=NamedSharding(mesh, P(None, "data"))),
        SimpleNamespace(shape=(n_groups, per_g, w),
                        sharding=NamedSharding(
                            mesh, P(None, "data", None))),
    )
    result_shape = SimpleNamespace(shape=(n_groups, rows_g, w))
    _, _, res_sh, arg_shs = scatter_pallas._partition(
        mesh, arg_shapes, result_shape)
    assert res_sh.spec == P(None, None, None)
    assert all(s.spec[0] is None for s in arg_shs)
