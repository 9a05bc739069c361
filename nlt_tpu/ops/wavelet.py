"""CDF9/7 and LeGall5/3 wavelet pyramids.

TPU-first JAX re-design of the wavelet layer under the Barron image loss
(reference: third_party/robust_loss/wavelet.py). Key behavioral contracts
kept for numerical parity:

- unbounded *reflecting* boundary conditions (not symmetric; supports pads
  larger than the tensor, needed at coarse pyramid levels)
  (reference: wavelet.py:96-148);
- `_upsample` is the exact transpose of `_downsample`, i.e. "transposed
  reflecting" boundaries (reference: wavelet.py:522-581);
- per-level `rescale` by scale_base**level and the standard flattened
  image layout (reference: wavelet.py:698-755).

TPU-first differences: all shapes are static (H, W, num_levels known at
trace time), so the reflect-pad index maps are computed with numpy at trace
time and become a single XLA gather; the separable filter convs compile to
MXU-friendly strided convolutions. Inputs are (N, H, W) stacks (channels
folded into the batch dim by the caller).
"""

import collections
import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

Filters = collections.namedtuple(
    "Filters", ["analysis_lo", "analysis_hi", "synthesis_lo", "synthesis_hi"])

HalfFilters = collections.namedtuple("HalfFilters", ["lo", "hi"])

# Non-redundant halves of the filter banks; center tap first, symmetrized
# by mirroring (CDF 9/7 from Cohen et al. 1992; LeGall 5/3).
_HALF_FILTERS = {
    "CDF9/7": HalfFilters(
        lo=np.array([
            +0.852698679009,
            +0.377402855613,
            -0.110624404418,
            -0.023849465020,
            +0.037828455507,
        ]),
        hi=np.array([
            +0.788485616406,
            -0.418092273222,
            -0.040689417609,
            +0.064538882629,
        ])),
    "LeGall5/3": HalfFilters(
        lo=np.array([0.75, 0.25, -0.125]) * np.sqrt(2.0),
        hi=np.array([1.0, -0.5]) / np.sqrt(2.0)),
}


def generate_filters(wavelet_type=None):
    """Full analysis/synthesis filter bank for `wavelet_type`; with no
    argument, the list of supported type names."""
    if wavelet_type is None:
        return list(_HALF_FILTERS.keys())
    half = _HALF_FILTERS[wavelet_type]

    def mirror(f):
        return np.concatenate([f[-1:0:-1], f])

    def alternating_sign(n):
        return (-1.0) ** np.arange(n)

    analysis_lo = mirror(half.lo)
    analysis_hi = mirror(half.hi)
    # Synthesis filters follow from the biorthogonality conditions.
    synthesis_lo = analysis_hi * mirror(alternating_sign(len(half.hi)))
    synthesis_hi = analysis_lo * mirror(alternating_sign(len(half.lo)))
    return Filters(analysis_lo, analysis_hi, synthesis_lo, synthesis_hi)


def _reflect_indices(n, pad_below, pad_above):
    """Index map implementing unbounded reflecting padding for a length-n
    axis: reflect([A,B,C,D], 2) -> [C,B,A,B,C,D,C,B]. Computed in numpy at
    trace time (shapes are static on TPU)."""
    i = np.arange(-pad_below, n + pad_above)
    period = max(1, 2 * (n - 1))
    i_mod = np.mod(i, period)
    return np.minimum(2 * (n - 1) - i_mod, i_mod).astype(np.int32)


def pad_reflecting(x, padding_below, padding_above, axis):
    """Unbounded reflecting pad along `axis` (static pad amounts)."""
    if padding_below == 0 and padding_above == 0:
        return x
    n = x.shape[axis]
    j = _reflect_indices(n, padding_below, padding_above)
    return jnp.take(x, jnp.asarray(j), axis=axis)


def _conv1d(x, f, axis, stride):
    """Convolve an (N, H, W) stack with 1-D filter `f` along `axis`
    (1 = rows, 2 = cols) at the given stride, VALID padding."""
    f = jnp.asarray(f, x.dtype)
    if axis == 1:
        kern = f[:, None, None, None]        # (K, 1, 1, 1) HWIO
        strides = (stride, 1)
    else:
        kern = f[None, :, None, None]        # (1, K, 1, 1)
        strides = (1, stride)
    y = lax.conv_general_dilated(
        x[:, :, :, None], kern, window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, :, :, 0]


@functools.lru_cache(maxsize=None)
def _downsample_matrix(n, f_bytes, flen, shift):
    """Dense (m, n) matrix implementing reflect-pad + correlate + decimate
    for a length-n axis: y[i] = sum_k f[k] x[reflect_idx[2i + shift + k]].
    Built once per (axis length, filter, shift) at trace time; tiny
    (<= 256 x 512 f64 at the flagship shapes)."""
    f = np.frombuffer(f_bytes, np.float64)
    idx = _reflect_indices(n, (flen - 1) // 2, flen // 2)
    if shift:
        idx = idx[shift:]
    m = (len(idx) - flen) // 2 + 1
    d = np.zeros((m, n))
    for i in range(m):
        for k in range(flen):
            d[i, idx[2 * i + k]] += f[k]
    return d


def _downsample(x, f, direction, shift):
    """Reflect-pad, correlate with `f`, and decimate by 2 along spatial
    axis `direction` (0 = rows, 1 = cols), with sub-pixel `shift` in
    {0, 1} (reference: wavelet.py:478-519).

    TPU-first: the pad + K-tap stride-2 correlation folds into one
    static band matrix (reflections included) applied as an MXU einsum.
    The 1-channel lax convs this replaces ran ~25x off the HBM roofline
    (reflect-gather materialization + C=1 conv lowering); the matmul's
    wasted multiplies-by-zero are free by comparison. Its autodiff
    transpose is automatically the exact transposed-reflecting operator
    (the reference's _upsample contract, wavelet.py:522-581)."""
    assert x.ndim == 3 and direction in (0, 1) and shift in (0, 1)
    f = np.ascontiguousarray(np.asarray(f, np.float64))
    n = x.shape[direction + 1]
    d = jnp.asarray(
        _downsample_matrix(n, f.tobytes(), len(f), shift), x.dtype)
    if direction == 0:
        return jnp.einsum("mh,bhw->bmw", d, x,
                          precision=lax.Precision.HIGHEST)
    return jnp.einsum("bhw,mw->bhm", x, d,
                      precision=lax.Precision.HIGHEST)


def _upsample(x, up_sz, f, direction, shift):
    """Transpose of _downsample: undecimate by 2 (interleave zeros with
    offset `shift`), crop/pad to `up_sz`, transposed-reflecting pad, then
    correlate with flipped `f` (reference: wavelet.py:522-581)."""
    assert x.ndim == 3 and direction in (0, 1) and shift in (0, 1)
    flen = len(f)
    axis = direction + 1

    # Undecimate: interleave with zeros along `axis`.
    zeros = jnp.zeros_like(x)
    pair = (x, zeros) if shift == 0 else (zeros, x)
    stacked = jnp.stack(pair, axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] *= 2
    x_un = stacked.reshape(new_shape)

    # Match the target size exactly (crop then zero-pad at the top end).
    cur = x_un.shape[axis]
    want = up_sz[direction]
    if cur > want:
        x_un = lax.slice_in_dim(x_un, 0, want, axis=axis)
    elif cur < want:
        pads = [(0, 0, 0)] * 3
        pads[axis] = (0, want - cur, 0)
        x_un = lax.pad(x_un, jnp.asarray(0, x.dtype), pads)
    # The non-upsampled axis must already match.
    other_axis = 3 - axis
    assert x_un.shape[other_axis] == up_sz[1 - direction], (
        x_un.shape, up_sz)

    x_padded = pad_reflecting(x_un, flen // 2, (flen - 1) // 2, axis)
    return _conv1d(x_padded, np.asarray(f)[::-1].copy(), axis, stride=1)


def get_max_num_levels(sz):
    """Max supported pyramid depth for an (N, H, W) shape tuple."""
    min_sz = min(sz[1], sz[2])
    return int(np.ceil(np.log2(max(1, min_sz))))


def construct(im, num_levels, wavelet_type):
    """Build a wavelet decomposition of an (N, H, W) stack.

    Returns a tuple ((band00, band01, band02), ..., residual) with
    `num_levels` 3-tuples of highpass bands plus the coarsest lowpass
    residual (reference: wavelet.py:600-648). Shapes are fully static.
    """
    assert im.ndim == 3, "Expected (N, H, W), got %s" % (im.shape,)
    if num_levels == 0:
        return (jnp.asarray(im),)
    assert num_levels <= get_max_num_levels(im.shape), (
        "num_levels=%d too deep for shape %s" % (num_levels, im.shape))
    filters = generate_filters(wavelet_type)
    pyr = []
    for _ in range(num_levels):
        hi = _downsample(im, filters.analysis_hi, 0, 1)
        lo = _downsample(im, filters.analysis_lo, 0, 0)
        pyr.append((
            _downsample(hi, filters.analysis_hi, 1, 1),
            _downsample(lo, filters.analysis_hi, 1, 1),
            _downsample(hi, filters.analysis_lo, 1, 0)))
        im = _downsample(lo, filters.analysis_lo, 1, 0)
    pyr.append(im)
    return tuple(pyr)


def collapse(pyr, wavelet_type):
    """Invert construct() back to the image (reference: wavelet.py:651-695)."""
    filters = generate_filters(wavelet_type)
    im = pyr[-1]
    num_levels = len(pyr) - 1
    for d in range(num_levels - 1, -1, -1):
        hi_hi, hi_lo, lo_hi = pyr[d]
        up_sz = (hi_lo.shape[1] + lo_hi.shape[1],
                 lo_hi.shape[2] + hi_lo.shape[2])
        lo_sz = (im.shape[1], up_sz[1])
        hi_sz = (hi_hi.shape[1], up_sz[1])
        im = (
            _upsample(
                _upsample(im, lo_sz, filters.synthesis_lo, 1, 0)
                + _upsample(hi_lo, lo_sz, filters.synthesis_hi, 1, 1),
                up_sz, filters.synthesis_lo, 0, 0)
            + _upsample(
                _upsample(lo_hi, hi_sz, filters.synthesis_lo, 1, 0)
                + _upsample(hi_hi, hi_sz, filters.synthesis_hi, 1, 1),
                up_sz, filters.synthesis_hi, 0, 1))
    return im


def rescale(pyr, scale_base):
    """Scale level d by scale_base**d (reference: wavelet.py:698-719)."""
    out = []
    for d in range(len(pyr) - 1):
        s = scale_base ** d
        out.append(tuple(pyr[d][b] * s for b in range(3)))
    out.append(pyr[-1] * (scale_base ** (len(pyr) - 1)))
    return out


def flatten(pyr):
    """Pack the pyramid into a single image-layout tensor: residual at the
    top-left, bands nested around it (reference: wavelet.py:722-755)."""
    flat = pyr[-1]
    for d in range(len(pyr) - 2, -1, -1):
        flat = jnp.concatenate([
            jnp.concatenate([flat, pyr[d][1]], axis=2),
            jnp.concatenate([pyr[d][2], pyr[d][0]], axis=2)], axis=1)
    return flat


def visualize(pyr, percentile=99.0):
    """uint8 visualization of a pyramid, for parity with the reference's
    debugging aid (reference: wavelet.py:758-792)."""
    vis_pyr = []
    for d in range(len(pyr) - 1):
        vis_band = []
        for b in range(3):
            band = pyr[d][b]
            # 'nearest' matches tfp.stats.percentile's default
            # interpolation; with it this function reproduces the
            # reference's wavelet_vis_golden.png bit-exactly.
            max_mag = jnp.percentile(
                jnp.abs(band), percentile, method="nearest")
            vis_band.append(
                0.5 * (1.0 + jnp.clip(band / max_mag, -1.0, 1.0)))
        vis_pyr.append(tuple(vis_band))
    resid = pyr[-1]
    resid_norm = (resid - resid.min()) / (resid.max() - resid.min())
    vis_pyr.append(resid_norm)
    flat = flatten(vis_pyr)
    return jnp.round(255.0 * jnp.transpose(flat, (1, 2, 0))).astype(jnp.uint8)
