"""Device mesh and sharding layer (L6).

First-class JAX distribution replacing the reference's
tf.distribute.MirroredStrategy + NCCL (reference: nlt/trainvali.py:254-264,
SURVEY.md §2.5). Design:

- a 2-D ('data', 'tile') Mesh: 'data' shards the batch (the reference's
  only parallelism axis), 'tile' optionally shards UV/image rows across
  chips — the texel-tile sharding the reference lacks; XLA/GSPMD inserts
  conv halo exchanges and resampler collectives automatically;
- parameters and optimizer state are fully replicated (NamedSharding
  with an empty PartitionSpec), so the gradient all-reduce rides ICI via
  compiler-inserted psums inside the jitted train step — the analog of
  MirroredStrategy's implicit NCCL all-reduce in apply_gradients
  (reference: trainvali.py:279-280);
- multi-host: `initialize_distributed()` + `make_global_batch` build
  global arrays from per-host shards via
  jax.make_array_from_process_local_data, the analog of
  experimental_distribute_dataset (reference: trainvali.py:90,112).

Tile-count envelope (measured on the 8-device rig,
tests/test_parallel.py::test_deep_pyramid_tile_sharding_128): the
'tile' axis shards UV/image ROWS, and the U-Net's stride-2 pyramid
shrinks the row count by 2^(n_stages) at the bottleneck (full
depth0=16 dragon schedule: 5 stages -> uvh/32 rows, e.g. 16 rows at
512^2, 4 at 128^2). Any n_tile that divides the INPUT row count is
numerically exact — including n_tile larger than the bottleneck's
rows: GSPMD pads/collapses the degenerate inner-stage shards and the
loss still matches single-device at rtol 1e-5. Past the bottleneck
row count the extra devices add halo-exchange latency for no work,
so n_tile <= uvh / 2^5 is the PERFORMANCE envelope, while
correctness holds for any divisor of uvh.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import logging as logutil

logger = logutil.Logger(loggee="parallel/mesh")

# Batch fields whose leading dim is the batch axis and that have spatial
# dims eligible for tile sharding (N H W C).
_SPATIAL_FIELDS = (
    "base", "cvis", "lvis", "warp", "rgb", "rgb_camspc",
    "nn_base", "nn_rgb", "nn_rgb_camspc")


def make_mesh(n_data=None, n_tile=1, devices=None, batch_size=None):
    """Build a ('data', 'tile') mesh over the given (default: all global)
    devices.

    If `batch_size` is given and n_data is not, the data axis is clamped
    to the largest divisor of the batch size that fits the available
    devices (excess devices go unused, with a warning) — the analog of
    MirroredStrategy requiring the global batch to split across replicas.
    """
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_data is None:
        assert n_dev % n_tile == 0, (n_dev, n_tile)
        n_data = n_dev // n_tile
        if batch_size is not None and batch_size % n_data != 0:
            while n_data > 1 and batch_size % n_data != 0:
                n_data -= 1
            if jax.process_count() > 1:
                # Dropping trailing devices can exclude some process's
                # devices entirely, breaking global-array assembly.
                raise ValueError(
                    "Batch size %d does not divide the %d-device data "
                    "axis; on a multi-host run pick a batch size that "
                    "divides the device count" % (batch_size,
                                                  n_dev // n_tile))
            logger.warn(
                "Batch size %d not divisible by %d devices; using a "
                "%dx%d mesh (%d devices idle)", batch_size,
                n_dev // n_tile, n_data, n_tile,
                n_dev - n_data * n_tile)
    assert n_data * n_tile <= n_dev, (
        "mesh %dx%d > %d devices" % (n_data, n_tile, n_dev))
    dev_array = np.asarray(
        devices[:n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(dev_array, ("data", "tile"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def replicate_tree(mesh, tree):
    """Place identical per-host values replicated over a (possibly
    multi-host) mesh. jax.device_put cannot move a COMMITTED local
    array to a sharding spanning other hosts' devices (it would be a
    cross-host transfer); dropping to host numpy first makes every
    leaf a process-local value each host supplies identically — the
    restored-checkpoint / precomputed-feature placement path for
    multi-process inference and serving."""
    def leaf(v):
        return jax.device_put(np.asarray(v), replicated(mesh))

    return jax.tree.map(leaf, tree)


def batch_spec(mesh, field, tile_spatial=False, ndim=4):
    """PartitionSpec for one batch field: batch dim on 'data', optionally
    image rows on 'tile'. Multi-observation fields (N, K, H, W, C) keep
    the obs axis unsharded so rows land on 'tile' as for 4-D fields."""
    if tile_spatial and field in _SPATIAL_FIELDS:
        if ndim == 5:
            return NamedSharding(mesh, P("data", None, "tile"))
        return NamedSharding(mesh, P("data", "tile"))
    return NamedSharding(mesh, P("data"))


def batch_shardings(mesh, batch, tile_spatial=False):
    """Sharding tree matching the array fields of a batch dict."""
    return {
        k: batch_spec(mesh, k, tile_spatial, ndim=getattr(v, "ndim", 4))
        for k, v in batch.items() if not isinstance(v, list)}


def shard_batch(mesh, batch, tile_spatial=False):
    """device_put the array fields onto the mesh; string-list fields
    (id, nn_id) stay on host.

    Batches whose leading dim doesn't divide the data axis (e.g. a
    remainder validation batch) are replicated instead — every device
    redundantly computes them, which keeps losses exact without
    padding/masking bookkeeping."""
    n_data = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):
            out[k] = v
        elif v.shape[0] % n_data != 0:
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            out[k] = jax.device_put(
                v, batch_spec(mesh, k, tile_spatial, ndim=v.ndim))
    return out


def make_global_tree(mesh, tree):
    """Assemble a global data-sharded array PYTREE from per-host local
    values whose leading dim is the (local) batch axis — the statics
    counterpart of make_global_batch (used by the multi-host GT-feature
    cache: every leaf of {'feats', 'products'}, including the resample
    plan arrays, is batch-leading)."""
    _, num_shards = process_data_shard(mesh)

    def leaf(v):
        v = np.asarray(v)
        spec = P(*(("data",) + (None,) * (v.ndim - 1)))
        gshape = (v.shape[0] * num_shards,) + v.shape[1:]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v, global_shape=gshape)

    return jax.tree.map(leaf, tree)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (controller-less, one process per host).

    No-op on a single process; on a pod slice, call before any JAX op.
    """
    if num_processes is None or num_processes <= 1:
        logger.info("Single-process run; skipping jax.distributed init")
        return
    platforms = (jax.config.jax_platforms or "")
    if platforms.split(",")[0] == "cpu":
        # Cross-process collectives on the CPU backend need an explicit
        # implementation (TPU ICI/DCN handles this natively). Lets the
        # full multi-host driver run as N local processes — the test
        # rig for pod-slice runs (tests/test_multihost.py).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d "
        "global devices", jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count())


def process_data_shard(mesh):
    """(shard_id, num_shards) for per-host DATA loading under this mesh.

    Hosts are example-sharded only along the 'data' axis: processes
    whose devices sit in the same data row(s) (i.e. that differ only
    along 'tile') must load the SAME examples — each contributes its
    devices' spatial tile of them. A single process owning every data
    row loads everything (shard 0 of 1).
    """
    me = jax.process_index()
    dev = np.asarray(mesh.devices)  # (data, tile) array of Devices
    my_rows = sorted({
        d for d in range(dev.shape[0])
        if any(x.process_index == me for x in dev[d].ravel())})
    assert my_rows, "process %d owns no devices in the mesh" % me
    n_data = dev.shape[0]
    rows_per_proc = len(my_rows)
    assert n_data % rows_per_proc == 0, (n_data, my_rows)
    num_shards = n_data // rows_per_proc
    shard_id = my_rows[0] // rows_per_proc
    return shard_id, num_shards


def make_global_batch(mesh, local_batch, tile_spatial=False,
                      replicate=False):
    """Assemble a global sharded batch from this process's local shard.

    Each host loads its own examples (per-host data loading, SURVEY.md
    §2.5's TPU-native equivalent); this builds the global jax.Arrays.

    replicate: set when every host loaded the SAME full batch (e.g. the
    fixed validation set, iterated unsharded) — the arrays are placed
    replicated instead of being mis-assembled as per-host shards.
    """
    # Hosts shard EXAMPLES along 'data' only; when 'tile' spans
    # processes, the hosts of one data row carry identical local
    # batches and each contributes its devices' spatial slice — the
    # explicit global_shape tells JAX the local data covers the full
    # spatial extent rather than being a concatenable shard of it.
    _, num_data_shards = process_data_shard(mesh)
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, list):
            out[k] = v
        elif replicate:
            out[k] = jax.make_array_from_process_local_data(
                replicated(mesh), v, global_shape=v.shape)
        else:
            sharding = batch_spec(mesh, k, tile_spatial, ndim=v.ndim)
            gshape = (v.shape[0] * num_data_shards,) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                sharding, v, global_shape=gshape)
    return out
