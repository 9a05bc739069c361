"""Cross-validation against torch (an independent implementation) for
the semantic conventions that matter for parity with the TF reference:
SAME conv padding, transposed-conv orientation, LeakyReLU slope, and
max-pooling — plus the LPIPS AlexNet feature geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from nlt_tpu.networks import elements


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_conv_same_stride1_matches_torch(rng):
    """SAME k=2 s=1 pads (0,1)x(0,1) — TF pads more on bottom/right."""
    x = rng.standard_normal((1, 6, 6, 3)).astype(np.float32)
    layer = elements.conv(2, 4, stride=1)
    params, _ = layer.init(jax.random.PRNGKey(0), 3)
    got = np.asarray(layer.apply(params, jnp.asarray(x)))

    w = np.asarray(params["w"])  # HWIO
    xt = _t(x).permute(0, 3, 1, 2)
    wt = _t(w).permute(3, 2, 0, 1)  # OIHW
    xt_pad = F.pad(xt, (0, 1, 0, 1))  # left,right,top,bottom
    expect = F.conv2d(xt_pad, wt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got - np.asarray(params["b"]), expect,
                               atol=1e-5)


def test_conv_same_stride2_matches_torch(rng):
    """SAME k=2 s=2 on even inputs needs no padding."""
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    layer = elements.conv(2, 4, stride=2)
    params, _ = layer.init(jax.random.PRNGKey(1), 5)
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    xt = _t(x).permute(0, 3, 1, 2)
    wt = _t(np.asarray(params["w"])).permute(3, 2, 0, 1)
    expect = F.conv2d(xt, wt, stride=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got - np.asarray(params["b"]), expect,
                               atol=1e-5)


def test_deconv_matches_torch_conv_transpose(rng):
    """Our deconv (TF Conv2DTranspose semantics) must equal torch's
    conv_transpose2d for k=s=2 (which needs no output cropping)."""
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    layer = elements.deconv(2, 2, stride=2)
    params, _ = layer.init(jax.random.PRNGKey(2), 3)
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    xt = _t(x).permute(0, 3, 1, 2)
    # torch conv_transpose kernel layout: (in, out, kh, kw)
    wt = _t(np.asarray(params["w"])).permute(2, 3, 0, 1)
    expect = F.conv_transpose2d(xt, wt, stride=2).permute(
        0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got - np.asarray(params["b"]), expect,
                               atol=1e-5)


def test_leakyrelu_slope(rng):
    x = rng.standard_normal((64,)).astype(np.float32)
    got = np.asarray(elements.act("leakyrelu").apply(
        {}, jnp.asarray(x)))
    expect = F.leaky_relu(_t(x), negative_slope=0.3).numpy()
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_maxpool_matches_torch(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    got = np.asarray(elements.pool("max").apply({}, jnp.asarray(x)))
    xt = _t(x).permute(0, 3, 1, 2)
    expect = F.max_pool2d(xt, 2, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_lpips_feature_shapes_match_alexnet(rng):
    """Our AlexNet tap geometry must match torch's canonical layout
    (so converted weights drop in shape-compatibly)."""
    from nlt_tpu.losses import lpips as lp

    params = lp.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    feats = lp._features(params, x)

    # torch AlexNet features on the same input size
    convs = [
        torch.nn.Conv2d(3, 64, 11, 4, 2),
        torch.nn.Conv2d(64, 192, 5, 1, 2),
        torch.nn.Conv2d(192, 384, 3, 1, 1),
        torch.nn.Conv2d(384, 256, 3, 1, 1),
        torch.nn.Conv2d(256, 256, 3, 1, 1),
    ]
    xt = torch.zeros(1, 3, 64, 64)
    expect_shapes = []
    for i, conv in enumerate(convs):
        xt = torch.relu(conv(xt))
        expect_shapes.append(tuple(xt.shape))
        if i in (0, 1):
            xt = F.max_pool2d(xt, 3, 2)
    got_shapes = [
        (f.shape[0], f.shape[3], f.shape[1], f.shape[2]) for f in feats]
    assert got_shapes == expect_shapes


def test_grads_match_torch_through_small_net(rng):
    """Forward AND input-gradient equivalence through conv->lrelu->deconv
    against torch."""
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    c = elements.conv(2, 4, stride=2)
    d = elements.deconv(2, 3, stride=2)
    pc, _ = c.init(jax.random.PRNGKey(3), 3)
    pd, _ = d.init(jax.random.PRNGKey(4), 4)

    def f(xx):
        h = c.apply(pc, xx)
        h = jax.nn.leaky_relu(h, 0.3)
        return jnp.sum(d.apply(pd, h) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(x)))

    xt = _t(x).permute(0, 3, 1, 2).requires_grad_(True)
    wc = _t(np.asarray(pc["w"])).permute(3, 2, 0, 1)
    bc = _t(np.asarray(pc["b"]))
    wd = _t(np.asarray(pd["w"])).permute(2, 3, 0, 1)
    bd = _t(np.asarray(pd["b"]))
    h = F.conv2d(xt, wc, bc, stride=2)
    h = F.leaky_relu(h, 0.3)
    out = F.conv_transpose2d(h, wd, bd, stride=2)
    (out ** 2).sum().backward()
    expect = xt.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(g, expect, atol=1e-4)
