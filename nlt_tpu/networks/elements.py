"""Layer elements: conv/deconv/upconv/norm/act/pool as pure (init, apply)
modules.

Functional JAX re-design of the reference's Keras layer factories
(reference: nlt/networks/elements.py:26-125). Parity notes:

- conv/deconv use 'SAME' padding and glorot-uniform kernel init, zero bias
  (Keras Conv2D defaults);
- leakyrelu slope is 0.3 (Keras LeakyReLU default), elu alpha 1.0;
- layer/instance/pixel norms match the reference's epsilons
  (1e-3 / 1e-6 / 1e-8); 'batch' norm reproduces Keras
  BatchNormalization semantics — batch statistics during training,
  EMA moving statistics at inference, kept as zero-gradient leaves in
  the params pytree (see the BatchNorm section below);
- pooling is 2x2 stride-2 'SAME'.

TPU-first: when kernel == stride (the shipped configs use kernel=2,
stride=2, reference: nlt/config/dragon_specular.ini:61-62), the strided
conv is algebraically a space-to-depth + matmul and the transposed conv a
matmul + depth-to-space — both are exact and map straight onto the MXU
with zero padding waste. General shapes fall back to XLA convolutions.

A Layer is a pair of pure functions:
    init(key, in_ch) -> (params, out_ch)
    apply(params, x) -> y            # x, y are NHWC
"""

import collections
import threading
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.img import upsample2x

Layer = collections.namedtuple("Layer", ["init", "apply", "name"])

# k==s convs can run as space-to-depth + matmul or as direct XLA convs.
# Flag for A/B timing (NLT_TPU_S2D=0 disables the matmul path).
# NLT_TPU_S2D_MIN_CH routes thin-channel layers (in_ch below the
# threshold) to the direct conv. Measured on the cached flagship step
# (v5e, honest slope timing): MIN_CH=64 and S2D=0 both land at ~63
# ms/step vs 42 for the full einsum path — XLA's native conv lowering
# loses even on the thin high-res layers despite the einsum path's
# relayout copies. The knob stays for future re-measurement only.
_S2D_FASTPATH = os.environ.get("NLT_TPU_S2D", "1") != "0"
_S2D_MIN_CH = int(os.environ.get("NLT_TPU_S2D_MIN_CH", "0"))
# Stride-1 small-kernel convs as a sum of shifted matmuls (one per
# tap): the shifts are layout-preserving pad+slice, so the matmuls
# chain with the neighboring k==s einsum matmuls without the layout
# round trips XLA's native conv lowering forces (NLT_TPU_S1MM=0
# restores lax.conv for A/B timing).
_S1_MATMUL = os.environ.get("NLT_TPU_S1MM", "1") != "0"
_S1_MAX_KERNEL = 3
# k==s convs: tap-split matmuls (one plain (NHW, C)x(C, O) matmul per
# kernel tap over single-index slices of the k-split view) instead of
# the one 6-D einsum whose (k, q, c)-contiguous operand forces a
# T(2,128) relayout of the whole activation. Measured a wash on the
# cached flagship step (33.6 vs 33.8 ms — the tap slices relayout
# roughly what the einsum operand did), so the single einsum stays
# default; the flag remains for re-measurement on other shapes.
_S2_TAPMM = os.environ.get("NLT_TPU_S2TAP", "0") != "0"
# k==s==2 convs as TWO row-parity matmuls: viewing x as
# (n, h/2, 2, w/2, 2c) is a FREE reshape of the NHWC buffer, so each
# parity slice is a streaming row copy and the contraction runs over
# the (column-pair, channel) dim directly. Measured WORSE than the 6-D
# einsum on the cached flagship step (37.6 vs 33.9 ms — XLA's layouts
# for the parity slices still relayout, and the 2c-wide matmuls feed
# the MXU worse). Off by default; kept for re-measurement.
_S2_ROWPAIR = os.environ.get("NLT_TPU_S2RP", "0") != "0"


def _glorot_uniform(key, shape, dtype=jnp.float32):
    """Keras Conv2D default kernel init; shape is HWIO."""
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _shift_matmul_conv(x, w, flip=False, transpose_pad=False):
    """SAME stride-1 conv as a sum of per-tap shifted matmuls.

    x: (N, H, W, C); w: (k, k, C, O) HWIO. SAME padding for stride 1
    pads (k-1)//2 before and k-1-(k-1)//2 after each spatial dim (TF
    convention). With transpose_pad the before/after split is swapped —
    combined with flip=True this is exactly the transpose of that SAME
    conv, i.e. Conv2DTranspose(stride=1).
    """
    n, h, wd, c = x.shape
    k = w.shape[0]
    beg = (k - 1) // 2
    end = k - 1 - beg
    if transpose_pad:
        beg, end = end, beg
    xp = jnp.pad(x, ((0, 0), (beg, end), (beg, end), (0, 0)))
    if flip:
        w = w[::-1, ::-1]
    y = None
    for di in range(k):
        for dj in range(k):
            part = jnp.einsum(
                "nhwc,co->nhwo",
                jax.lax.slice(xp, (0, di, dj, 0),
                              (n, di + h, dj + wd, c)),
                w[di, dj], preferred_element_type=jnp.float32)
            y = part if y is None else y + part
    return y


def conv(kernel_size, n_ch_out, stride=1):
    """2-D convolution, SAME padding (reference: elements.py:26-31)."""

    def init(key, in_ch):
        w = _glorot_uniform(key, (kernel_size, kernel_size, in_ch, n_ch_out))
        return {"w": w, "b": jnp.zeros((n_ch_out,), w.dtype)}, n_ch_out

    def apply(params, x):
        w = params["w"].astype(x.dtype)
        b = params["b"].astype(x.dtype)
        k = kernel_size
        if (_S2D_FASTPATH and k == stride and x.shape[1] % k == 0
                and x.shape[2] % k == 0 and x.shape[3] >= _S2D_MIN_CH):
            # Space-to-depth + matmul: exact SAME conv when k == s.
            # The contraction runs on the 6-D view directly — no
            # materialized transpose; XLA folds the (k, q, c) layout
            # into the matmul.
            n, h, wd, c = x.shape
            patches = x.reshape(n, h // k, k, wd // k, k, c)
            # Accumulate in f32 on the MXU regardless of activation
            # dtype (bf16 accumulation falls off the fast path).
            if _S2_ROWPAIR and k == 2:
                xr = x.reshape(n, h // 2, 2, wd // 2, 2 * c)
                wr = w.reshape(2, 2 * c, n_ch_out)  # (k_h, (k_w c), o)
                y = None
                for r in range(2):
                    part = jnp.einsum(
                        "nhwd,do->nhwo", xr[:, :, r], wr[r],
                        preferred_element_type=jnp.float32)
                    y = part if y is None else y + part
                y = y.astype(x.dtype)
            elif _S2_TAPMM:
                wk = w.reshape(k, k, c, n_ch_out)
                y = None
                for di in range(k):
                    for dj in range(k):
                        part = jnp.einsum(
                            "nhwc,co->nhwo", patches[:, :, di, :, dj, :],
                            wk[di, dj],
                            preferred_element_type=jnp.float32)
                        y = part if y is None else y + part
                y = y.astype(x.dtype)
            else:
                y = jnp.einsum(
                    "nhkwqc,kqco->nhwo", patches,
                    w.reshape(k, k, c, n_ch_out),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        elif (_S1_MATMUL and stride == 1 and 1 < k <= _S1_MAX_KERNEL):
            y = _shift_matmul_conv(x, w).astype(x.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(stride, stride), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    return Layer(init, apply, "conv%dx%ds%d" % (
        kernel_size, kernel_size, stride))


def deconv(kernel_size, n_ch_out, stride=1):
    """Transposed 2-D convolution, SAME padding
    (reference: elements.py:34-39)."""

    def init(key, in_ch):
        w = _glorot_uniform(key, (kernel_size, kernel_size, in_ch, n_ch_out))
        return {"w": w, "b": jnp.zeros((n_ch_out,), w.dtype)}, n_ch_out

    def apply(params, x):
        w = params["w"].astype(x.dtype)
        b = params["b"].astype(x.dtype)
        k = kernel_size
        if _S2D_FASTPATH and k == stride and x.shape[3] >= _S2D_MIN_CH:
            n, h, wd, c = x.shape
            if _S2_ROWPAIR and k == 2:
                # Two matmuls emitting the (column-pair, channel)-packed
                # rows per output-row parity, then a streaming row
                # interleave (the stack+reshape is memory-order exact).
                wr = w.transpose(0, 2, 1, 3).reshape(
                    2, c, 2 * n_ch_out)  # (k_h, c, (k_w o))
                parts = [
                    jnp.einsum("nhwc,co->nhwo", x, wr[r],
                               preferred_element_type=jnp.float32)
                    for r in range(2)]
                y = jnp.stack(parts, axis=2).astype(x.dtype)
                y = y.reshape(n, h * 2, wd * 2, n_ch_out)
            else:
                # Matmul + depth-to-space: each input pixel emits a
                # k x k block. The einsum emits (n, h, k, w, q, o)
                # directly so the depth-to-space is a pure reshape, no
                # transpose copy.
                y = jnp.einsum(
                    "nhwc,ckqo->nhkwqo", x,
                    w.transpose(2, 0, 1, 3),
                    preferred_element_type=jnp.float32).astype(x.dtype)
                y = y.reshape(n, h * k, wd * k, n_ch_out)
        elif (_S1_MATMUL and stride == 1 and 1 < k <= _S1_MAX_KERNEL):
            # Conv2DTranspose(stride=1) is the transpose of the SAME
            # stride-1 conv: correlation with the spatially flipped
            # kernel and the before/after padding split swapped
            # (verified elementwise against lax.conv_transpose for
            # k in {2, 3}; for odd k the splits coincide).
            y = _shift_matmul_conv(
                x, w, flip=True, transpose_pad=True).astype(x.dtype)
        else:
            # TF Conv2DTranspose is the gradient of a forward conv, which
            # equals lax.conv_transpose with the kernel spatially flipped.
            y = jax.lax.conv_transpose(
                x, w[::-1, ::-1], strides=(stride, stride), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    return Layer(init, apply, "deconv%dx%ds%d" % (
        kernel_size, kernel_size, stride))


def upconv(n_ch_out):
    """2x bilinear upsample + 2x2 SAME conv (reference: elements.py:42-48)."""
    inner = conv(2, n_ch_out, stride=1)

    def init(key, in_ch):
        return inner.init(key, in_ch)

    def apply(params, x):
        return inner.apply(params, upsample2x(x))

    return Layer(init, apply, "upconv")


def _no_params(apply_fn, name):
    def init(key, in_ch):
        return {}, in_ch

    return Layer(init, lambda params, x: apply_fn(x), name)


def iden():
    return _no_params(lambda x: x, "iden")


def act(type_):
    """relu / leakyrelu(0.3) / elu (reference: elements.py:69-78)."""
    if type_ == "relu":
        return _no_params(jax.nn.relu, "relu")
    if type_ == "leakyrelu":
        return _no_params(
            lambda x: jax.nn.leaky_relu(x, negative_slope=0.3), "leakyrelu")
    if type_ == "elu":
        return _no_params(jax.nn.elu, "elu")
    raise NotImplementedError(type_)


# ---- BatchNorm moving statistics -----------------------------------
#
# Keras BatchNormalization semantics (reference: elements.py:51-66):
# training normalizes by BATCH statistics and updates an exponential
# moving average; inference normalizes by the MOVING statistics. In
# this pure-functional stack the moving stats live in the params
# pytree (checkpointed; their loss gradient is identically zero, so
# the optimizer never moves them) under per-layer unique key names
# ("moving_mean__<bn_name>"), and the train step updates them through
# a trace-time collector: while a `collect_bn_stats()` context is
# active (parallel/train.loss_fn), each BN layer normalizes by batch
# stats AND records them under its bn_name; the step then EMA-merges
# the recorded stats into the params by key name
# (parallel/train.merge_bn_stats). Without an active collector
# (vali/test/serve), BN normalizes by the moving stats.

BN_MOMENTUM = 0.99  # Keras BatchNormalization default

# Thread-local: concurrent traces (e.g. a background placement or
# serving thread tracing while the main thread traces the train step)
# each see their own collector instead of interleaving taps.
_BN_STATE = threading.local()
_BN_AUTO_IDS = iter(range(1 << 30))


def _bn_taps():
    return getattr(_BN_STATE, "taps", None)


class collect_bn_stats:
    """Trace-time collector: within the context, BN layers use batch
    statistics and record them as {bn_name: {'mean', 'var'}}."""

    def __enter__(self):
        self._prev = _bn_taps()
        _BN_STATE.taps = {}
        return _BN_STATE.taps

    def __exit__(self, *exc):
        _BN_STATE.taps = self._prev
        return False


def merge_bn_stats(params, taps, momentum=None):
    """EMA-merge collected batch statistics into the moving-stats
    leaves of a params pytree, matched by the unique key names BN
    layers bake into their param dicts. Non-BN leaves pass through
    untouched (in particular the optimizer-updated gamma/beta)."""
    if not taps:
        return params
    m = BN_MOMENTUM if momentum is None else momentum
    from jax.tree_util import tree_map_with_path

    def upd(path, leaf):
        key = getattr(path[-1], "key", None)
        if not isinstance(key, str):
            return leaf
        for stat, prefix in (("mean", "moving_mean__"),
                             ("var", "moving_var__")):
            if key.startswith(prefix):
                tap = taps.get(key[len(prefix):])
                if tap is None:
                    return leaf
                new = (m * leaf.astype(jnp.float32)
                       + (1.0 - m) * tap[stat])
                return new.astype(leaf.dtype)
        return leaf

    return tree_map_with_path(upd, params)


def norm(type_, bn_name=None):
    """batch / layer / instance / pixel / None (reference:
    elements.py:51-66, 97-121).

    bn_name: unique, construction-stable name for a "batch" layer's
    moving-statistics param keys (convnet passes "query_bn0", ...).
    Auto-named layers work but their checkpoint keys depend on
    process-wide construction order — always pass a name in models.
    """
    if type_ is None or str(type_).lower() == "none":
        return iden()

    if type_ == "batch":
        name = bn_name or ("bn_auto%d" % next(_BN_AUTO_IDS))
        mean_key = "moving_mean__" + name
        var_key = "moving_var__" + name

        def init(key, in_ch):
            return {"gamma": jnp.ones((in_ch,)),
                    "beta": jnp.zeros((in_ch,)),
                    mean_key: jnp.zeros((in_ch,)),
                    var_key: jnp.ones((in_ch,))}, in_ch

        def apply(params, x):
            taps = _bn_taps()
            if taps is not None:
                mean = jnp.mean(x, axis=(0, 1, 2))
                var = jnp.var(x, axis=(0, 1, 2))
                taps[name] = {
                    "mean": jax.lax.stop_gradient(mean.astype(
                        jnp.float32)),
                    "var": jax.lax.stop_gradient(var.astype(
                        jnp.float32))}
            else:
                mean = params[mean_key].astype(x.dtype)
                var = params[var_key].astype(x.dtype)
            xn = ((x - mean.reshape(1, 1, 1, -1))
                  * jax.lax.rsqrt(var.reshape(1, 1, 1, -1) + 1e-3))
            return xn * params["gamma"].astype(x.dtype) \
                + params["beta"].astype(x.dtype)

        return Layer(init, apply, "batchnorm")

    if type_ == "layer":
        # Keras LayerNormalization defaults: last axis, eps 1e-3.
        def init(key, in_ch):
            return {"gamma": jnp.ones((in_ch,)),
                    "beta": jnp.zeros((in_ch,))}, in_ch

        def apply(params, x):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            xn = (x - mean) * jax.lax.rsqrt(var + 1e-3)
            return xn * params["gamma"].astype(x.dtype) \
                + params["beta"].astype(x.dtype)

        return Layer(init, apply, "layernorm")

    if type_ == "instance":
        # Per-sample, per-channel spatial normalization, eps 1e-6
        # (reference: elements.py:97-100).
        def init(key, in_ch):
            return {"gamma": jnp.ones((in_ch,)),
                    "beta": jnp.zeros((in_ch,))}, in_ch

        def apply(params, x):
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
            return xn * params["gamma"].astype(x.dtype) \
                + params["beta"].astype(x.dtype)

        return Layer(init, apply, "instancenorm")

    if type_ == "pixel":
        # b[i,j,k] = a[i,j,k] / sqrt(mean_k a^2 + eps)
        # (reference: elements.py:103-121).
        def apply_fn(x):
            return x * jax.lax.rsqrt(
                jnp.mean(jnp.square(x), axis=3, keepdims=True) + 1e-8)

        return _no_params(apply_fn, "pixelnorm")

    raise NotImplementedError(type_)


def pool(type_):
    """2x2 stride-2 SAME pooling (reference: elements.py:81-94)."""
    if type_ is None or str(type_).lower() == "none":
        return iden()

    if type_ == "max":
        def apply_fn(x):
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "SAME")
        return _no_params(apply_fn, "maxpool")

    if type_ == "avg":
        def apply_fn(x):
            summed = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
            counts = jax.lax.reduce_window(
                jnp.ones_like(x), 0.0, jax.lax.add, (1, 2, 2, 1),
                (1, 2, 2, 1), "SAME")
            return summed / counts
        return _no_params(apply_fn, "avgpool")

    raise NotImplementedError(type_)


def dense(n_out, activation=None):
    """Fully-connected layer (Keras Dense parity: glorot kernel, zero
    bias), for the MLP network."""

    def init(key, in_ch):
        fan_in, fan_out = in_ch, n_out
        limit = np.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(key, (in_ch, n_out), jnp.float32,
                               -limit, limit)
        return {"w": w, "b": jnp.zeros((n_out,), w.dtype)}, n_out

    def apply(params, x):
        y = x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)
        if activation == "relu":
            y = jax.nn.relu(y)
        elif activation == "sigmoid":
            y = jax.nn.sigmoid(y)
        elif activation == "tanh":
            y = jnp.tanh(y)
        elif activation is not None:
            raise NotImplementedError(activation)
        return y

    return Layer(init, apply, "dense%d" % n_out)


def sequential(layers, name="seq"):
    """Compose layers into one Layer (params is a list)."""

    def init(key, in_ch):
        params = []
        ch = in_ch
        for layer in layers:
            key, sub = jax.random.split(key)
            p, ch = layer.init(sub, ch)
            params.append(p)
        return params, ch

    def apply(params, x):
        for layer, p in zip(layers, params):
            x = layer.apply(p, x)
        return x

    return Layer(init, apply, name)
