"""Pallas scatter-add kernel (ops/scatter_pallas.py): correctness via
the Pallas interpreter on the CPU backend (the Mosaic path is exercised
on real TPU, where it measured exact vs np.add.at at the flagship
shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlt_tpu.ops import resample as resample_mod
from nlt_tpu.ops.scatter_pallas import scatter_add_rows


@pytest.mark.parametrize("n_rows,n_groups,per_group,w", [
    (64, 2, 50, 5),        # ragged, multi-group
    (2048, 4, 750, 12),    # flagship-like width
    (96, 1, 50, 3),        # single group
    (16, 1, 3, 1),         # tiny
])
def test_matches_np_add_at(n_rows, n_groups, per_group, w):
    rng = np.random.RandomState(n_rows + w)
    gr = n_rows // n_groups
    gi = np.concatenate(
        [g * gr + rng.randint(0, gr, per_group) for g in range(n_groups)])
    idx = jnp.asarray(gi.astype(np.int32))
    upd = jnp.asarray(rng.rand(len(gi), w).astype(np.float32))
    out = scatter_add_rows(idx, upd, n_rows, n_groups)
    ref = np.zeros((n_rows, w), np.float32)
    np.add.at(ref, gi, np.asarray(upd))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_duplicate_rows_accumulate():
    idx = jnp.asarray(np.array([3, 3, 3, 3], np.int32))
    upd = jnp.asarray(np.ones((4, 2), np.float32))
    out = scatter_add_rows(idx, upd, 8, 1)
    np.testing.assert_array_equal(np.asarray(out[3]), [4.0, 4.0])
    assert float(jnp.abs(out).sum()) == 8.0


def test_resampler_vjp_uses_kernel_path_equivalently(monkeypatch):
    """Force the resampler VJP through the Pallas kernel (interpret
    mode on CPU) and check gradients equal the XLA-scatter fallback."""
    rng = np.random.RandomState(0)
    n, h, w, c = 2, 16, 16, 3
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    warp = np.tile(
        np.stack([xs, ys], -1).astype(np.float32)[None], (n, 1, 1, 1))
    warp = jnp.asarray(warp + rng.rand(n, h, w, 2).astype(np.float32))
    g = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))

    def loss(im):
        return jnp.sum(resample_mod.resample(im, warp) * g)

    grad_fallback = jax.grad(loss)(img)

    # Route through the kernel regardless of backend/row thresholds.
    orig = resample_mod._take_rows_bwd

    def forced(n_groups, res, grads):
        idx, n_rows = res
        return scatter_add_rows(idx, grads, n_rows, n_groups), None

    monkeypatch.setattr(resample_mod, "_take_rows_bwd", forced)
    resample_mod._take_rows.defvjp(
        resample_mod._take_rows_fwd, forced)
    try:
        grad_kernel = jax.grad(loss)(img)
    finally:
        resample_mod._take_rows.defvjp(
            resample_mod._take_rows_fwd, orig)
    np.testing.assert_allclose(
        np.asarray(grad_kernel), np.asarray(grad_fallback),
        rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n_rows,n_groups,per_group,w", [
    (64, 2, 50, 5),
    (2048, 4, 750, 12),
    (96, 1, 50, 3),
])
def test_planned_matches_np_add_at(n_rows, n_groups, per_group, w):
    from nlt_tpu.ops.scatter_pallas import (make_plan,
                                            scatter_add_rows_planned)
    rng = np.random.RandomState(n_rows * 7 + w)
    gr = n_rows // n_groups
    gi = np.concatenate(
        [g * gr + rng.randint(0, gr, per_group) for g in range(n_groups)])
    idx = jnp.asarray(gi.astype(np.int32))
    upd = jnp.asarray(rng.rand(len(gi), w).astype(np.float32))
    routed, lo, hi = jax.jit(
        make_plan, static_argnums=(1, 2))(idx, n_rows, n_groups)
    out = scatter_add_rows_planned(routed, lo, hi, upd, n_rows, n_groups)
    ref = np.zeros((n_rows, w), np.float32)
    np.add.at(ref, gi, np.asarray(upd))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)
