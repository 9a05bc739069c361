"""LPIPS perceptual loss (AlexNet backbone + linear calibration heads).

The reference ships LPIPS as a frozen TF1 GraphDef executed by the TF C++
runtime with gradients flowing through (reference: nlt/losses.py:121-169;
the .pb itself is an external download, not vendored). Here the same
net-lin_alex_v0.1 architecture is implemented natively in JAX so the whole
loss compiles into the training step under XLA:

- AlexNet features: 5 conv stages (64, 192, 384, 256, 256 channels),
  ReLU taps after each stage, maxpool between stages 1-2-3;
- inputs scaled from [-1, 1] by the BGR-ish channel normalization LPIPS
  uses (shift/scale constants from the public LPIPS reference);
- unit-normalize each feature map across channels, squared difference,
  1x1 linear head per stage, spatial average, sum over stages.

Weights: ``load_weights(npz_path)`` accepts a converted checkpoint
(tools/convert_lpips.py converts the torch `lpips` package checkpoint or
a TF .pb when one is available). In hermetic environments with no weight
artifact, ``init_params(key)`` yields a deterministic random-feature
network — random convolutional features are a known usable perceptual
metric, but numbers are NOT comparable to canonical LPIPS; training-path
code logs a warning in that case.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging as logutil

logger = logutil.Logger(loggee="losses/lpips")

# (out_channels, kernel, stride, pad) per conv stage; maxpool(3, 2) after
# stages 0 and 1, and before stage 2... AlexNet layout:
#   conv1 11x11/4 pad2 -> relu -> pool
#   conv2 5x5/1 pad2   -> relu -> pool
#   conv3 3x3/1 pad1   -> relu
#   conv4 3x3/1 pad1   -> relu
#   conv5 3x3/1 pad1   -> relu
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}

# Channel normalization applied to [-1, 1] inputs (public LPIPS constants).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(key, dtype=jnp.float32):
    """Deterministic He-init AlexNet + ones linear heads."""
    params = {"convs": [], "lins": []}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX_CFG):
        key, k1 = jax.random.split(key)
        fan_in = k * k * in_ch
        w = jax.random.normal(k1, (k, k, in_ch, out_ch), dtype) * float(
            np.sqrt(2.0 / fan_in))
        b = jnp.zeros((out_ch,), dtype)
        params["convs"].append({"w": w, "b": b})
        # Non-negative linear head weights, as in canonical LPIPS.
        params["lins"].append(
            {"w": jnp.full((out_ch,), 1.0 / out_ch, dtype)})
        in_ch = out_ch
    return params


def load_weights(npz_path, dtype=jnp.float32):
    """Load converted LPIPS weights: conv{i}_w (k,k,in,out), conv{i}_b,
    lin{i}_w (C,) arrays in an .npz."""
    params = {"convs": [], "lins": []}
    with np.load(npz_path) as f:
        for i in range(len(_ALEX_CFG)):
            params["convs"].append({
                "w": jnp.asarray(f["conv%d_w" % i], dtype),
                "b": jnp.asarray(f["conv%d_b" % i], dtype)})
            params["lins"].append({
                "w": jnp.asarray(f["lin%d_w" % i], dtype)})
    return params


def _features(params, x):
    """x: NHWC in [-1, 1]. Returns the 5 ReLU feature taps."""
    assert min(x.shape[1], x.shape[2]) >= 32, (
        "LPIPS needs inputs >= 32 px: below that the deeper AlexNet "
        "stages have empty feature maps and the spatial mean is NaN "
        "(input %s; check imh/imw or lpips_max_res)" % (x.shape,))
    x = (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)
    feats = []
    for i, ((out_ch, k, stride, pad), conv_p) in enumerate(
            zip(_ALEX_CFG, params["convs"])):
        x = jax.lax.conv_general_dilated(
            x, conv_p["w"], window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + conv_p["b"]
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID")
    return feats


def _normalize_channels(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=3, keepdims=True))
    return x / (norm + eps)


def features_normalized(params, img):
    """Channel-normalized AlexNet taps of an NHWC image in [-1, 1]
    (tuple of 5 arrays). These are exactly the per-image terms LPIPS
    compares, so for a static image they can be computed once and
    cached (see losses.LPIPS `gt_feats` / trainvali's GT feature
    cache) — the distance and its gradient w.r.t. the OTHER image are
    bit-identical to the uncached path."""
    return tuple(_normalize_channels(f) for f in _features(params, img))


def lpips_from_feats(params, feats0, feats1):
    """LPIPS distance between two normalized tap tuples. Returns (N,)."""
    total = 0.0
    for a, b, lin in zip(feats0, feats1, params["lins"]):
        d = (a - b) ** 2
        # 1x1 non-negative linear head, then spatial mean.
        w = jax.nn.relu(lin["w"])
        total = total + jnp.mean(jnp.sum(d * w, axis=3), axis=(1, 2))
    return total


def lpips(params, img0, img1):
    """LPIPS distance between NHWC images in [-1, 1]. Returns (N,)."""
    return lpips_from_feats(
        params, features_normalized(params, img0),
        features_normalized(params, img1))
