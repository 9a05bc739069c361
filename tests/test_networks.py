"""Network-layer tests: element semantics (incl. the k==s MXU fast path vs
the general XLA conv), U-Net structure bookkeeping, MLP skips
(reference structure: nlt/networks/convnet.py:31-90, mlp.py:28-53)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.networks import convnet, elements, mlp


def test_conv_fast_path_matches_xla(rng):
    """k == s conv via space-to-depth+matmul must equal the XLA SAME conv."""
    key = jax.random.PRNGKey(0)
    layer = elements.conv(2, 8, stride=2)
    params, out_ch = layer.init(key, 5)
    assert out_ch == 8
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    got = layer.apply(params, x)
    expect = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["b"]
    assert got.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_deconv_fast_path_matches_xla(rng):
    key = jax.random.PRNGKey(1)
    layer = elements.deconv(2, 6, stride=2)
    params, _ = layer.init(key, 4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    got = layer.apply(params, x)
    # TF-style transposed conv == lax.conv_transpose with the kernel
    # spatially flipped.
    expect = jax.lax.conv_transpose(
        x, params["w"][::-1, ::-1], strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["b"]
    assert got.shape == (1, 16, 16, 6)
    np.testing.assert_allclose(got, expect, atol=1e-5)


@pytest.mark.parametrize("k", [2, 3])
def test_stride1_shift_matmul_matches_xla(rng, k):
    """Stride-1 convs/deconvs run as sums of shifted matmuls: values AND
    gradients must equal the XLA conv/conv_transpose lowering."""
    key = jax.random.PRNGKey(7)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 5)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 9, 11, 6)).astype(np.float32))

    layer = elements.conv(k, 6, stride=1)
    params, _ = layer.init(key, 5)
    expect = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["b"]
    np.testing.assert_allclose(layer.apply(params, x), expect, atol=1e-5)

    def loss(fn, p, x):
        return jnp.sum(fn(p, x) * g)

    gp, gx = jax.grad(
        lambda p, xx: loss(layer.apply, p, xx), argnums=(0, 1))(params, x)
    gp_r, gx_r = jax.grad(
        lambda p, xx: loss(
            lambda pp, xxx: jax.lax.conv_general_dilated(
                xxx, pp["w"], window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + pp["b"],
            p, xx), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(gx, gx_r, atol=1e-4)
    np.testing.assert_allclose(gp["w"], gp_r["w"], atol=1e-4)

    dlayer = elements.deconv(k, 6, stride=1)
    dparams, _ = dlayer.init(key, 5)
    dexpect = jax.lax.conv_transpose(
        x, dparams["w"][::-1, ::-1], strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + dparams["b"]
    np.testing.assert_allclose(
        dlayer.apply(dparams, x), dexpect, atol=1e-5)


def test_conv_same_padding_odd_kernel(rng):
    layer = elements.conv(3, 4, stride=1)
    params, _ = layer.init(jax.random.PRNGKey(2), 3)
    x = jnp.asarray(rng.standard_normal((1, 7, 7, 3)).astype(np.float32))
    assert layer.apply(params, x).shape == (1, 7, 7, 4)


def test_upconv_doubles_resolution(rng):
    layer = elements.upconv(4)
    params, _ = layer.init(jax.random.PRNGKey(3), 2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    assert layer.apply(params, x).shape == (1, 16, 16, 4)


@pytest.mark.parametrize("type_", ["batch", "layer", "instance", "pixel"])
def test_norms_normalize(rng, type_):
    layer = elements.norm(type_)
    params, _ = layer.init(jax.random.PRNGKey(4), 6)
    x = jnp.asarray(
        (rng.standard_normal((2, 8, 8, 6)) * 3 + 5).astype(np.float32))
    y = layer.apply(params, x)
    assert y.shape == x.shape
    assert float(jnp.abs(y).max()) < 50
    if type_ == "pixel":
        # Unit RMS across channels per pixel
        rms = jnp.sqrt(jnp.mean(y ** 2, axis=3))
        np.testing.assert_allclose(np.asarray(rms), 1.0, atol=1e-2)


def test_norm_none_is_identity(rng):
    layer = elements.norm(None)
    params, _ = layer.init(jax.random.PRNGKey(5), 3)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32))
    np.testing.assert_array_equal(layer.apply(params, x), x)
    layer2 = elements.norm("None")
    np.testing.assert_array_equal(layer2.apply({}, x), x)


def test_acts():
    x = jnp.asarray(np.array([[-2.0, -0.5, 0.0, 1.0]], np.float32))
    relu = elements.act("relu")
    np.testing.assert_allclose(relu.apply({}, x), [[0, 0, 0, 1]])
    lrelu = elements.act("leakyrelu")
    np.testing.assert_allclose(
        lrelu.apply({}, x), [[-0.6, -0.15, 0, 1]], rtol=1e-6)
    elu = elements.act("elu")
    np.testing.assert_allclose(
        float(elu.apply({}, x)[0, 0]), np.expm1(-2.0), rtol=1e-6)


@pytest.mark.parametrize("type_", ["max", "avg"])
def test_pools_halve_resolution(rng, type_):
    layer = elements.pool(type_)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    y = layer.apply({}, x)
    assert y.shape == (1, 4, 4, 3)
    if type_ == "max":
        assert float(y[0, 0, 0, 0]) == float(x[0, :2, :2, 0].max())
    else:
        np.testing.assert_allclose(
            float(y[0, 0, 0, 0]), float(x[0, :2, :2, 0].mean()), rtol=1e-5)


def test_convnet_structure_dragon_specular():
    """depth0=16 depth=256 k=2 s=2, no norm/pool, leakyrelu
    (reference: nlt/config/dragon_specular.ini:58-64)."""
    net = convnet.Network(16, 256, 2, 2, norm_type=None,
                          act_type="leakyrelu", pool_type=None)
    # 13 schedule entries -> 14 stages (1x1 in + 12 + 1x1 out)
    assert len(net.stages) == 14
    assert net.is_contracting == [True] * 7 + [False] * 7
    assert np.cumprod(net.spatsize_changes)[-1] == 1


def test_convnet_roundtrip_shapes(rng):
    """Standalone U-Net (no obs interleaving) must return to input res
    with 3 output channels (the resolution assert,
    reference: nlt/networks/convnet.py:88-90)."""
    # Note: the schedule is only encoder/decoder-balanced when the decay
    # tail has length 2, i.e. depth0 == 16 — the only value the reference
    # ships (its own gen_feat_n docstring example 8->64 would fail the
    # reference's own resolution assert).
    net = convnet.Network(16, 32, 2, 2, act_type="leakyrelu")
    params, out_ch = net.init_params(jax.random.PRNGKey(0), 5)
    assert out_ch == 3
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 5)).astype(np.float32))
    y = net.apply(params, x)
    assert y.shape == (1, 32, 32, 3)


def test_convnet_with_pooling_roundtrip(rng):
    net = convnet.Network(16, 16, 2, 1, act_type="relu", pool_type="max")
    params, _ = net.init_params(jax.random.PRNGKey(1), 3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    y = net.apply(params, x)
    assert y.shape == (1, 16, 16, 3)


def test_mlp_sequential(rng):
    net = mlp.Network([16, 8, 4], act=["relu", "relu", None])
    params, out_ch = net.init_params(jax.random.PRNGKey(0), 10)
    assert out_ch == 4
    x = jnp.asarray(rng.standard_normal((5, 10)).astype(np.float32))
    assert net.apply(params, x).shape == (5, 4)


def test_mlp_skip_concat(rng):
    """NeRF-style input re-concat at given depths
    (reference: nlt/networks/mlp.py:42-53)."""
    net = mlp.Network([16, 16, 8], act=["relu"] * 3, skip_at=[1])
    params, out_ch = net.init_params(jax.random.PRNGKey(0), 6)
    x = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32))
    y = net.apply(params, x)
    assert y.shape == (3, 8)
    # Layer 2's kernel must expect 16 + 6 inputs
    assert params[2]["w"].shape == (22, 8)


def test_batchnorm_moving_stats_train_eval(rng):
    """Keras BN semantics (reference: elements.py:51-66): training uses
    batch statistics and records taps; inference uses the moving stats;
    merge_bn_stats EMA-updates the moving leaves and nothing else."""
    layer = elements.norm("batch", bn_name="t0")
    params, _ = layer.init(jax.random.PRNGKey(4), 3)
    assert set(params) == {
        "gamma", "beta", "moving_mean__t0", "moving_var__t0"}
    x = jnp.asarray(
        (rng.standard_normal((2, 8, 8, 3)) * 3 + 5).astype(np.float32))

    # Train mode (collector active): normalized by batch stats.
    with elements.collect_bn_stats() as taps:
        y_train = layer.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(y_train, axis=(0, 1, 2))), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(taps["t0"]["mean"]),
        np.asarray(jnp.mean(x, axis=(0, 1, 2))), rtol=1e-6)

    # Eval mode (no collector): moving stats (init 0/1) -> y ~= x.
    y_eval = layer.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_eval), np.asarray(x), atol=1e-2)

    # EMA merge: only the moving leaves move, toward the batch stats.
    merged = elements.merge_bn_stats(params, taps)
    np.testing.assert_array_equal(
        np.asarray(merged["gamma"]), np.asarray(params["gamma"]))
    np.testing.assert_allclose(
        np.asarray(merged["moving_mean__t0"]),
        0.99 * 0.0 + 0.01 * np.asarray(taps["t0"]["mean"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(merged["moving_var__t0"]),
        0.99 * 1.0 + 0.01 * np.asarray(taps["t0"]["var"]), rtol=1e-5)

    # After many merges of the same batch, eval converges to train.
    p = params
    for _ in range(800):
        p = elements.merge_bn_stats(p, taps)
    y_eval2 = layer.apply(p, x)
    np.testing.assert_allclose(
        np.asarray(y_eval2), np.asarray(y_train), atol=2e-2)


def test_batchnorm_grad_accum_stats_pin(rng):
    """Pin the documented grad_accum BN approximation
    (parallel/train.py): the merged batch stats are the mean over
    microbatches of per-micro stats, where microbatch i is the strided
    slice [i::N]. Means are exact (mean of equal-size means == the
    full-batch mean); variances are the mean of within-micro variances,
    NOT the full-batch variance."""
    from nlt_tpu.models import get_model_class
    from nlt_tpu.parallel import train as train_mod
    from tests.test_model_nlt import small_config, make_batch

    cfg = small_config(norm="batch")
    model = get_model_class("nlt")(cfg)
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))
    params0 = jax.tree.map(np.asarray, state["params"])

    b2 = make_batch(rng)
    batch = {k: np.concatenate([v, v[::-1] * 0.5 + 0.1])
             for k, v in b2.items()}  # bs 4, micro-batches differ

    # Expected taps: forward the two strided microbatches under the
    # collector with the INITIAL params (taps are computed in the
    # forward pass, before the update).
    taps_micro = []
    for i in range(2):
        micro = {k: jnp.asarray(v[i::2]) for k, v in batch.items()}
        with elements.collect_bn_stats() as taps:
            model.apply(state["params"], micro, "train")
        taps_micro.append(jax.tree.map(np.asarray, dict(taps)))
    taps_mean = jax.tree.map(
        lambda a, b: (a + b) / 2, taps_micro[0], taps_micro[1])
    expected = elements.merge_bn_stats(params0, taps_mean)

    step2 = train_mod.make_train_step(model, tx, grad_accum=2)
    state2, loss, _ = step2(state, {
        k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(loss))

    def stats_of(params):
        return {str(p): np.asarray(v)
                for p, v in jax.tree_util.tree_leaves_with_path(params)
                if "moving_" in str(p[-1])}

    got = stats_of(state2["params"])
    want = stats_of(expected)
    assert set(got) == set(want) and want
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4,
                                   atol=1e-6, err_msg=k)

    # Document the approximation: mean-of-micro-vars differs from the
    # full-batch variance (they'd coincide only if the micro means
    # were equal).
    with elements.collect_bn_stats() as taps_full:
        model.apply(
            jax.device_put(params0),
            {k: jnp.asarray(v) for k, v in batch.items()}, "train")
    taps_full = jax.tree.map(np.asarray, dict(taps_full))
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()),
        {k: v["var"] for k, v in taps_mean.items()},
        {k: v["var"] for k, v in taps_full.items()})
    assert any(d > 1e-7 for d in jax.tree.leaves(diffs)), diffs


def test_batchnorm_trains_end_to_end(rng):
    """A norm=batch model's train step updates moving stats in the
    checkpointable params; the eval step consumes them."""
    from nlt_tpu.models import get_model_class
    from nlt_tpu.parallel import train as train_mod
    from tests.test_model_nlt import small_config, make_batch

    cfg = small_config(norm="batch")
    model = get_model_class("nlt")(cfg)
    tx = train_mod.make_optimizer(1e-3)
    state = train_mod.init_state(model, tx, jax.random.PRNGKey(0))

    flat = jax.tree_util.tree_leaves_with_path(state["params"])
    mm_paths = [p for p, _ in flat
                if "moving_mean__" in str(p[-1])]
    assert mm_paths, "norm=batch model has no moving-stat leaves"

    batch = make_batch(rng)
    step = train_mod.make_train_step(model, tx)

    def stats_of(params):
        return {str(p): np.asarray(v)
                for p, v in jax.tree_util.tree_leaves_with_path(params)
                if "moving_" in str(p[-1])}

    s0 = stats_of(state["params"])  # before the step donates state
    state2, loss, _ = step(state, batch)
    assert np.isfinite(float(loss))
    s2 = stats_of(state2["params"])
    moved = [k for k in s0 if np.abs(s2[k] - s0[k]).max() > 1e-8]
    assert moved, "train step did not update any moving statistics"

    eval_step = train_mod.make_eval_step(model)
    eloss, _ = eval_step(state2, batch)
    assert np.isfinite(float(eloss))
