"""Pallas TPU kernel: flat row scatter-add for the resampler backward.

XLA's scatter for the resampler's VJP (1M rows of 12 floats into a
(n_rows, 12) table) runs at ~66 ms inside the training program — its
layout assignment pins the accumulator column-major and the per-row
cost balloons ~16x over the standalone floor (ops/resample.py). This
kernel does the same scatter-add with the accumulator table resident in
VMEM and a scalar loop over updates, immune to XLA's layout choices.

Design findings (all measured with chained timing; un-chained
"slope" timings of independent kernel calls overlap on this device and
under-read):

- dynamic *sublane* (row) indexing in VMEM runs ~10 ns/update; dynamic
  *lane* indexing must be 128-aligned, and packing 4 rows into a
  128-lane row with static 32-lane slot offsets costs 6x (cross-lane
  relayout per access) — so the table stays one row per sublane row;
- a VMEM tensor with last dim W < 128 is lane-padded to 128, so a
  262144-row f32 table costs 128 MB — over the ~128 MB budget. The
  table lives in a SCRATCH buffer (single-buffered, unlike output
  windows which Mosaic double-buffers) of PIECE=131072 rows (64 MB),
  i.e. 2 pieces per 512^2 image;
- per-iteration guards are expensive on the scalar core: @pl.when
  masking costs ~17 ns even when skipping, clip+where ~14 ns. Instead
  the caller pre-routes every update's row for each piece on the VPU:
  in-piece rows map to their local row, misses map to a DUMP ROW past
  the piece (garbage accumulates there and is discarded), so the
  kernel's inner loop is one unconditional read-add-write;
- update indices are image-contiguous (the batch is folded into the
  row index), so the grid is (group, piece, chunk) and each kernel
  invocation only scans its own group's updates;
- scalar indices stream through SMEM in chunks (SMEM is 1 MB total);
  the accumulated piece is DMA'd to the HBM output after its last
  chunk.

API: scatter_add_rows(idx, upd, n_rows, n_groups) ==
     zeros((n_rows, W)).at[idx].add(upd) up to accumulation order
     (f32; tests assert allclose at 1e-6 and exactness on disjoint
     rows).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per scratch-resident table piece (f32, lane-padded x128 ->
# 64 MB scratch; +1 sublane row of dump space).
_PIECE = 131072
# Updates per chunk: idx chunk 32 KB SMEM, upd window ~4.2 MB VMEM
# (double-buffered by Mosaic).
_CHUNK = 8192
# Scan-bound subchunks per chunk: the [lo, hi) skip spans are kept at
# _CHUNK/_SUB granularity (one 512-query scanline at 512^2), so dead
# runs INSIDE a live chunk — e.g. the background left/right of a
# foreground scanline segment — are skipped too, at zero extra grid
# cost (the kernel unrolls _SUB bounded loops per invocation).
_SUB = 16
_VMEM_LIMIT = 110 * 1024 * 1024


def _kernel(idx_ref, lo_ref, hi_ref, upd_ref, out_ref, table, sem, *,
            piece, chunk, chunks_per_group, w):
    n = pl.program_id(0)
    h = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        table[:] = jnp.zeros_like(table)

    def body(i, _):
        r = idx_ref[i]  # pre-routed: local row, or the dump row
        table[pl.ds(r, 1), 0:w] = (
            table[pl.ds(r, 1), 0:w] + upd_ref[0, pl.ds(i, 1), :])
        return 0

    # Only scan [lo, hi) per subchunk: the caller pre-computes, per
    # (group, piece, chunk, subchunk), the first/last update position
    # that hits this piece. Updates are in output-scanline order, so
    # for coherent warps each piece's hits per scanline are a
    # contiguous run — other pieces' updates and gradient-dead
    # (background) runs are skipped instead of scanned.
    j = ((n * pl.num_programs(1) + h) * chunks_per_group + c) * _SUB
    for s in range(_SUB):
        jax.lax.fori_loop(lo_ref[j + s], hi_ref[j + s], body, 0)

    @pl.when(c == chunks_per_group - 1)
    def _():
        # DMA the WHOLE table (dump rows included): a row-sliced view
        # of the lane-padded scratch is not DMA-able (Mosaic requires
        # lane-aligned slice shapes); the caller strips the dump rows
        # with a cheap dense slice.
        piece_i = n * pl.num_programs(1) + h
        dma = pltpu.make_async_copy(
            table,
            out_ref.at[piece_i],  # whole (rows_out, w) plane: DMA-able
            sem)
        dma.start()
        dma.wait()


def plan_geometry(group_rows, r_group):
    """Static kernel geometry for a (group_rows, r_group) scatter:
    (pieces_per_group, piece, chunks_per_group, r_pad_group). Shared by
    the in-step routing below and by cached plans (make_plan) so the
    two always agree."""
    pieces_per_group = -(-group_rows // _PIECE)
    piece = min(_PIECE, -(-group_rows // pieces_per_group))
    piece = -(-piece // 8) * 8  # sublane-aligned
    chunks_per_group = -(-r_group // _CHUNK)
    r_pad_group = chunks_per_group * _CHUNK
    return pieces_per_group, piece, chunks_per_group, r_pad_group


def make_plan(idx, n_rows, n_groups=1):
    """Precompute the kernel's routing for a fixed idx: the per-piece
    routed local rows and the per-(group, piece, chunk) [lo, hi) scan
    bounds. The plan depends only on idx (for the resampler: only on
    the static warp field), so callers with static indices compute it
    once per example and cache it in HBM (parallel/feat_cache.py),
    removing this dense routing pass from the hot step.

    Args:
        idx: (R,) int32 target rows (global; -1 marks padding).
        n_rows, n_groups: as in scatter_add_rows.

    Returns:
        routed: (n_groups, pieces_per_group, r_pad_group) int32 —
            per-piece local row, or the dump row (== piece) on miss.
        lo, hi: (n_groups, pieces_per_group, chunks_per_group, _SUB)
            int32 chunk-local scan bounds per subchunk.
    """
    (r_total,) = idx.shape
    assert n_rows % n_groups == 0 and r_total % n_groups == 0
    group_rows = n_rows // n_groups
    r_group = r_total // n_groups
    pieces_per_group, piece, chunks_per_group, r_pad_group = (
        plan_geometry(group_rows, r_group))

    idx = idx.reshape(n_groups, r_group)
    if r_pad_group != r_group:
        pad = r_pad_group - r_group
        # Padding rows route to the dump row in every piece.
        idx = jnp.concatenate(
            [idx, jnp.full((n_groups, pad), -1, jnp.int32)], axis=1)

    # Pre-route rows per piece on the VPU: local row when the update
    # hits the piece, else the dump row (index `piece`). Group-local
    # rows come from a modulo, which is SHARD-INVARIANT: a device
    # holding groups [k, k+m) of a batch-sharded call computes the same
    # local rows as the global program would (enables
    # custom_partitioning).
    local = jnp.where(idx >= 0, idx % group_rows, -1)
    piece_ids = jnp.arange(pieces_per_group, dtype=jnp.int32)
    rel = local[:, None, :] - piece_ids[None, :, None] * piece
    hit = jnp.logical_and(rel >= 0, rel < piece)
    routed = jnp.where(hit, rel, piece).astype(jnp.int32)

    # Per-(group, piece, chunk, subchunk) loop bounds: the [lo, hi)
    # span of hit positions (chunk-local) within each _CHUNK/_SUB
    # subchunk (empty subchunks get lo > hi, a zero-iteration loop).
    sub_len = _CHUNK // _SUB
    hit5 = hit.reshape(n_groups, pieces_per_group,
                       chunks_per_group, _SUB, sub_len)
    pos = jnp.arange(_CHUNK, dtype=jnp.int32).reshape(_SUB, sub_len)
    lo = jnp.min(jnp.where(hit5, pos, _CHUNK),
                 axis=-1).astype(jnp.int32)
    hi = jnp.max(jnp.where(hit5, pos + 1, 0),
                 axis=-1).astype(jnp.int32)
    return routed, lo, hi


def _scatter_planned_local(routed, lo, hi, upd, group_rows):
    """Kernel invocation with precomputed routing. routed/lo/hi as
    returned by make_plan (grouped shapes); upd (n_groups, r_group, W)
    float32. Returns the (n_groups * group_rows, W) table."""
    n_groups, pieces_per_group, r_pad_group = routed.shape
    chunks_per_group = lo.shape[2]
    _, r_group, w = upd.shape
    pieces_chk, piece, chunks_chk, r_pad_chk = plan_geometry(
        group_rows, r_group)
    assert (pieces_chk, chunks_chk, r_pad_chk) == (
        pieces_per_group, chunks_per_group, r_pad_group), (
        "plan geometry mismatch: plan %s vs expected %s" % (
            (pieces_per_group, chunks_per_group, r_pad_group),
            (pieces_chk, chunks_chk, r_pad_chk)))
    rows_out = piece + 8

    if r_pad_group != r_group:
        pad = r_pad_group - r_group
        upd = jnp.concatenate(
            [upd, jnp.zeros((n_groups, pad, w), upd.dtype)], axis=1)

    kernel = functools.partial(
        _kernel, piece=piece, chunk=_CHUNK,
        chunks_per_group=chunks_per_group, w=w)
    n_pieces_total = n_groups * pieces_per_group
    n_bounds = n_pieces_total * chunks_per_group * _SUB
    out = pl.pallas_call(
        kernel,
        grid=(n_groups, pieces_per_group, chunks_per_group),
        # Lane dim padded to 128: HBM DMA destinations must be
        # tile-aligned; the caller slices back to w.
        out_shape=jax.ShapeDtypeStruct(
            (n_pieces_total, rows_out, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (_CHUNK,),
                lambda n, h, c, P=pieces_per_group,
                C=chunks_per_group: ((n * P + h) * C + c,),
                memory_space=pltpu.SMEM),
            # Whole (tiny) bounds arrays resident in SMEM; the kernel
            # indexes them by its own grid position.
            pl.BlockSpec(
                (n_bounds,), lambda n, h, c: (0,),
                memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (n_bounds,), lambda n, h, c: (0,),
                memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, _CHUNK, w),
                lambda n, h, c: (n, c, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((piece + 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        # Off-TPU (tests, debugging): run the kernel in the Pallas
        # interpreter — same semantics, no Mosaic.
        interpret=jax.default_backend() != "tpu",
    )(routed.reshape(-1), lo.reshape(-1), hi.reshape(-1), upd)

    # Strip lane padding, dump rows, and piece overhang.
    out = out[:, :, :w].reshape(n_groups, pieces_per_group, rows_out, w)
    out = out[:, :, :piece].reshape(n_groups, pieces_per_group * piece, w)
    return out[:, :group_rows].reshape(n_groups * group_rows, w)


def _scatter_local(idx, upd, n_rows, n_groups=1):
    """zeros((n_rows, W)).at[idx].add(upd) via the VMEM kernel.

    Args:
        idx: (R,) int32 target rows.
        upd: (R, W) float32 updates.
        n_rows: output table rows.
        n_groups: contiguity groups (e.g. batch size): updates in the
            g-th R/n_groups-slice of idx/upd must target rows in the
            g-th n_rows/n_groups-slice of the table. Pass 1 if unknown
            (correct for any idx, but scans all updates per piece).
    """
    r_total, w = upd.shape
    assert idx.shape == (r_total,)
    assert n_rows % n_groups == 0 and r_total % n_groups == 0
    group_rows = n_rows // n_groups
    routed, lo, hi = make_plan(idx, n_rows, n_groups)
    return _scatter_planned_local(
        routed, lo, hi, upd.reshape(n_groups, r_total // n_groups, w),
        group_rows)


# ---- multi-device partitioning ------------------------------------
#
# The scatter is independent per contiguity group, and group-local rows
# are computed with a shard-invariant modulo, so a batch-sharded call
# partitions trivially: each device runs the kernel on its local
# groups. To express this under Shardy, the partitioned callable takes
# GROUPED shapes — (G, Rg) indices, (G, Rg, W) updates -> (G, rows_g,
# W) table — so the group dim is a shared factor the sharding rule can
# propagate ("g r, g r w -> g m w").

from jax.experimental.custom_partitioning import (  # noqa: E402
    custom_partitioning)
from jax.sharding import NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def _axis_size(mesh, axis):
    if axis is None:
        return 1
    names = axis if isinstance(axis, tuple) else (axis,)
    size = 1
    for n in names:
        size *= mesh.shape[n]
    return size


def _dim0_axis(sharding):
    spec = getattr(sharding, "spec", None)
    if not spec or len(spec) == 0:
        return None
    return spec[0]


def _partition(mesh, arg_shapes, result_shape):
    n_groups = arg_shapes[0].shape[0]
    rows_g = result_shape.shape[1]
    axis = _dim0_axis(arg_shapes[1].sharding)
    if axis is None:
        axis = _dim0_axis(arg_shapes[0].sharding)
    shards = _axis_size(mesh, axis)
    if axis is None or n_groups % shards != 0 or shards <= 1:
        arg_shardings = (NamedSharding(mesh, P(None, None)),
                         NamedSharding(mesh, P(None, None, None)))
        result_sharding = NamedSharding(mesh, P(None, None, None))
        shards = 1
    else:
        arg_shardings = (NamedSharding(mesh, P(axis, None)),
                         NamedSharding(mesh, P(axis, None, None)))
        result_sharding = NamedSharding(mesh, P(axis, None, None))
    def lower_fn(idx2, upd3):
        g = idx2.shape[0]
        w = upd3.shape[2]
        flat = _scatter_local(
            idx2.reshape(-1), upd3.reshape(-1, w), g * rows_g, g)
        return flat.reshape(g, rows_g, w)

    return mesh, lower_fn, result_sharding, arg_shardings


def _infer_sharding(mesh, arg_shapes, result_shape):
    axis = _dim0_axis(arg_shapes[1].sharding)
    if axis is None:
        axis = _dim0_axis(arg_shapes[0].sharding)
    n_groups = arg_shapes[0].shape[0]
    if axis is None or n_groups % _axis_size(mesh, axis) != 0:
        return NamedSharding(mesh, P(None, None, None))
    return NamedSharding(mesh, P(axis, None, None))


@functools.lru_cache(maxsize=None)
def _get_scatter_cp(rows_g):
    """A custom_partitioning instance specialized for rows-per-group
    (baked into the closure so trace caches can never mix two
    different output row counts for identical input shapes)."""

    @custom_partitioning
    def _scatter_cp(idx2, upd3):
        g = idx2.shape[0]
        w = upd3.shape[2]
        flat = _scatter_local(idx2.reshape(-1), upd3.reshape(-1, w),
                              g * rows_g, g)
        return flat.reshape(g, rows_g, w)

    _scatter_cp.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer_sharding,
        sharding_rule="g r, g r w -> g m w")
    return _scatter_cp


@functools.partial(jax.jit, static_argnames=("n_rows", "n_groups"))
def scatter_add_rows(idx, upd, n_rows, n_groups=1):
    """Public entry: partition-aware scatter-add (see _scatter_local
    for semantics). Batch-sharded inputs (dim 0 = groups) run the
    kernel independently per shard; unsharded/odd shardings fall back
    to a replicated single call."""
    r_total, w = upd.shape
    assert n_rows % n_groups == 0 and r_total % n_groups == 0
    rows_g = n_rows // n_groups
    out3 = _get_scatter_cp(rows_g)(
        idx.reshape(n_groups, r_total // n_groups),
        upd.reshape(n_groups, r_total // n_groups, w))
    return out3.reshape(n_rows, w)


# ---- planned variant (precomputed routing) -------------------------


def _partition_planned(mesh, arg_shapes, result_shape):
    rows_g = result_shape.shape[1]
    axis = _dim0_axis(arg_shapes[3].sharding)
    if axis is None:
        axis = _dim0_axis(arg_shapes[0].sharding)
    n_groups = arg_shapes[0].shape[0]
    shards = _axis_size(mesh, axis)
    if axis is None or n_groups % shards != 0 or shards <= 1:
        spec3 = P(None, None, None)
        arg_shardings = (NamedSharding(mesh, spec3),) * 4
        result_sharding = NamedSharding(mesh, spec3)
    else:
        spec3 = P(axis, None, None)
        arg_shardings = (NamedSharding(mesh, spec3),) * 4
        result_sharding = NamedSharding(mesh, spec3)

    def lower_fn(routed, lo, hi, upd3):
        return _scatter_planned_local(
            routed, lo, hi, upd3, rows_g).reshape(
            upd3.shape[0], rows_g, upd3.shape[2])

    return mesh, lower_fn, result_sharding, arg_shardings


def _infer_sharding_planned(mesh, arg_shapes, result_shape):
    axis = _dim0_axis(arg_shapes[3].sharding)
    if axis is None:
        axis = _dim0_axis(arg_shapes[0].sharding)
    n_groups = arg_shapes[0].shape[0]
    if axis is None or n_groups % _axis_size(mesh, axis) != 0:
        return NamedSharding(mesh, P(None, None, None))
    return NamedSharding(mesh, P(axis, None, None))


@functools.lru_cache(maxsize=None)
def _get_scatter_planned_cp(rows_g):
    """custom_partitioning instance for the planned scatter, keyed on
    rows-per-group (same reasoning as _get_scatter_cp)."""

    @custom_partitioning
    def _scatter_planned_cp(routed, lo, hi, upd3):
        g, _, w = upd3.shape
        return _scatter_planned_local(
            routed, lo, hi, upd3, rows_g).reshape(g, rows_g, w)

    _scatter_planned_cp.def_partition(
        partition=_partition_planned,
        infer_sharding_from_operands=_infer_sharding_planned,
        # routed's last dim (padded updates) and lo/hi's
        # (chunks, subchunks) are distinct factors from upd's r: name
        # them separately.
        sharding_rule="g p q, g p c s, g p c s, g r w -> g m w")
    return _scatter_planned_cp


@functools.partial(jax.jit, static_argnames=("n_rows", "n_groups"))
def scatter_add_rows_planned(routed, lo, hi, upd, n_rows, n_groups=1):
    """scatter_add_rows with the routing precomputed by make_plan
    (e.g. cached per example when the indices derive from a static warp
    field). routed/lo/hi: grouped plan arrays; upd: (R, W) float32.
    Returns the (n_rows, W) accumulated table."""
    r_total, w = upd.shape
    assert n_rows % n_groups == 0 and r_total % n_groups == 0
    assert routed.shape[0] == n_groups and lo.shape[0] == n_groups
    rows_g = n_rows // n_groups
    out3 = _get_scatter_planned_cp(rows_g)(
        routed, lo, hi,
        upd.reshape(n_groups, r_total // n_groups, w))
    return out3.reshape(n_rows, w)
