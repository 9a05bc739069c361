"""Small tensor-shape helpers (reference: nlt/util/tensor.py)."""

import jax.numpy as jnp


def shape_as_list(x):
    return list(x.shape)


def make_nhwc(x, n_ch=3):
    """3D (NHW) -> 4D (NHWC) by expanding and tiling the channel dim
    (reference: nlt/util/tensor.py:30-50). Shapes are static under jit."""
    if x.ndim == 4:
        return x
    assert x.ndim == 3, "Expected NHW or NHWC"
    x = x[..., None]
    if n_ch > 1:
        x = jnp.tile(x, (1, 1, 1, n_ch))
    return x
