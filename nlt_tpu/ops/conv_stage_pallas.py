"""Pallas demonstration kernel: fused space-to-depth conv (k=2, s=2)
+ bias + LeakyReLU.

The flagship U-Net's contracting convs lower to space-to-depth + matmul
(networks/elements.py). Measured against XLA's fused lowering on a v5e
(bs 4, f32):

    h=512 c=32  o=16 : XLA 1.47 ms, Pallas 2.51 ms  (XLA wins)
    h=256 c=32  o=32 : XLA 0.49 ms, Pallas 0.83 ms  (XLA wins)
    h=128 c=64  o=64 : XLA 0.77 ms, Pallas 0.53 ms  (Pallas 1.45x)

i.e. Pallas wins once channels are MXU-lane-sized and the matmul
dominates; XLA wins the bandwidth-bound high-res/thin-channel shapes.
The production path stays on XLA (the whole U-Net forward is 0.11 ms);
this kernel exists to (a) document the Pallas formulation of the
framework's core op with honest numbers, (b) serve as the starting
point for future fusions (e.g. folding a stage's second k2s1 conv into
the same VMEM residency), and (c) pin kernel-vs-XLA equivalence in
tests.

Constraints: C must be Mosaic-tileable (C=5 fails to compile); H, W
even; f32.

Formulation: grid over (batch, row-blocks). Each program loads a
(2·BH, W, C) input block into VMEM, splits the four (di, dj) taps with
4-D reshapes, sums four MXU matmuls against the kernel's (C, O) tap
blocks with f32 accumulation, adds bias, applies LeakyReLU, and writes
the (BH, W/2, O) output block.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, w_ref, b_ref, o_ref, *, bh, w_out, c_in, c_out,
            negative_slope):
    x = x_ref[0]  # (2*BH, W, C)
    # Split the four (di, dj) taps with 4-D reshapes + single-index
    # slices (Mosaic supports neither step-2 slices nor the
    # strided-concat formulation), then sum four MXU matmuls against the
    # kernel's four (C, O) tap blocks — algebraically the same
    # space-to-depth matmul.
    a = x.reshape(2 * bh, w_out, 2, c_in)
    dj0 = a[:, :, 0, :]                      # (2BH, W/2, C)
    dj1 = a[:, :, 1, :]
    b0 = dj0.reshape(bh, 2, w_out, c_in)
    b1 = dj1.reshape(bh, 2, w_out, c_in)
    taps = (b0[:, 0], b1[:, 0], b0[:, 1], b1[:, 1])  # (00, 01, 10, 11)

    w_all = w_ref[...]  # (4C, O): tap-major blocks (di, dj) row-major
    y = None
    for t, tap in enumerate(taps):
        part = jnp.dot(
            tap.reshape(bh * w_out, c_in),
            w_all[t * c_in:(t + 1) * c_in],
            preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    y = y + b_ref[0]
    y = jnp.where(y >= 0, y, negative_slope * y)
    o_ref[0] = y.reshape(bh, w_out, c_out).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("negative_slope", "block_rows", "interpret"))
def conv2x2s2_lrelu(x, w, b, negative_slope=0.3, block_rows=16,
                    interpret=False):
    """Fused 2x2 stride-2 conv + bias + LeakyReLU.

    Args:
        x: (N, H, W, C) with H, W even.
        w: (2, 2, C, O) HWIO kernel (the elements.conv layout).
        b: (O,) bias.

    Returns: (N, H/2, W/2, O), equal to
        leaky_relu(conv_same_k2s2(x, w) + b).
    """
    n, h, wd, c = x.shape
    assert h % 2 == 0 and wd % 2 == 0
    o = w.shape[3]
    h_out, w_out = h // 2, wd // 2
    # Cap the input block around 1 MB: Mosaic stack-allocates the
    # kernel's reshape intermediates in VMEM (~5x the block), and the
    # pipeline double-buffers blocks on top of that.
    budget_rows = max(1, (1 << 20) // (2 * wd * c * 4))
    bh = max(1, min(block_rows, budget_rows, h_out))
    while h_out % bh:
        bh -= 1
    grid = (n, h_out // bh)

    # Patch ordering must match the kernel's concat order
    # (p00|p01|p10|p11) = (di, dj) in row-major = the HWIO reshape order.
    wmat = w.reshape(4 * c, o)

    kernel = functools.partial(
        _kernel, bh=bh, w_out=w_out, c_in=c, c_out=o,
        negative_slope=negative_slope)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * bh, wd, c),
                         lambda ni, hi: (ni, hi, 0, 0)),
            pl.BlockSpec((4 * c, o), lambda ni, hi: (0, 0)),
            pl.BlockSpec((1, o), lambda ni, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w_out, o),
                               lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, o), x.dtype),
        interpret=interpret,
    )(x, wmat, b.reshape(1, o))
