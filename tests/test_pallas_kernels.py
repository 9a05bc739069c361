"""Pallas kernel equivalence tests (interpret mode on the CPU backend;
the same kernel was validated bit-exact against XLA on a real v5e —
numbers in ops/conv_stage_pallas.py's docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.networks import elements
from nlt_tpu.ops.conv_stage_pallas import conv2x2s2_lrelu


@pytest.mark.parametrize("shape,o", [
    ((2, 16, 32, 8), 16),
    ((1, 64, 64, 16), 8),
    ((3, 8, 8, 32), 32),
])
def test_matches_xla_stage(rng, shape, o):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    layer = elements.conv(2, o, stride=2)
    params, _ = layer.init(jax.random.PRNGKey(0), shape[3])
    ref = jax.nn.leaky_relu(layer.apply(params, x), 0.3)
    got = conv2x2s2_lrelu(
        x, params["w"], params["b"], interpret=True)
    assert got.shape == (shape[0], shape[1] // 2, shape[2] // 2, o)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_negative_slope_passthrough(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    layer = elements.conv(2, 8, stride=2)
    params, _ = layer.init(jax.random.PRNGKey(1), 8)
    got_relu = conv2x2s2_lrelu(
        x, params["w"], params["b"], negative_slope=0.0, interpret=True)
    ref = jax.nn.relu(layer.apply(params, x))
    np.testing.assert_allclose(np.asarray(got_relu), np.asarray(ref),
                               atol=1e-5)


def test_block_rows_invariance(rng):
    """Different row blockings must give identical results."""
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)).astype(np.float32))
    layer = elements.conv(2, 8, stride=2)
    params, _ = layer.init(jax.random.PRNGKey(2), 8)
    a = conv2x2s2_lrelu(x, params["w"], params["b"], block_rows=16,
                        interpret=True)
    b = conv2x2s2_lrelu(x, params["w"], params["b"], block_rows=4,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
