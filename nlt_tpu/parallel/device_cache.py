"""Device-resident example cache: keep batch fields in HBM across
epochs so steady-state epochs upload (almost) nothing.

Every array field of this dataset is a deterministic function of the
example id (supervised pairs, warps, and neighbor observations are
fixed per (cam, light) config — datasets/nlt.py; the per-epoch seed
only shuffles ORDER), so re-uploading batches every epoch is redundant
traffic. The reference streams every batch to the accelerator every
epoch (tf.data feeding in the eager loop, reference:
nlt/trainvali.py:165-204); on hosts where the host->device link is the
bottleneck (this container's tunnel moves ~23 MB per 512^2 uint8-wire
batch at ~60 MB/s — more than 8x the device step) this cache removes
that traffic from epoch 1 on: each example's field rows live in HBM,
and a batch whose examples are all cached is assembled on-device by
one jitted concat that emits directly into the exact sharding
mesh.shard_batch would have chosen.

Capacity-capped (`cache_device_mb`): once the cap is reached further
examples stream like before — insertion simply stops, nothing is
evicted, so behavior is epoch-stable. The driver enables it for
single-process, batched runs (multi-process batches are assembled
globally from per-host slices by mesh.make_global_batch; the cache
would need a per-host variant like the static-feature cache's).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging as logutil
from . import mesh as mesh_mod

logger = logutil.Logger(loggee="parallel/device_cache")


class DeviceExampleCache:
    """Per-example-id HBM cache of batch field rows.

    `shard_batch(mesh, arrays, ids, tile_spatial)` is a drop-in for
    `mesh.shard_batch(mesh, arrays, tile_spatial)` for batches whose
    fields all carry the batch axis first (the dataset contract).
    """

    def __init__(self, cap_mb=2048):
        self.cap_bytes = int(cap_mb) << 20
        self._rows = {}      # id -> {field: (1, ...) device array}
        self._bytes = 0
        self._full_logged = False
        self._assemble = {}  # signature -> jitted concat
        self.hits = 0
        self.misses = 0

    def stats(self):
        return {"hits": self.hits, "misses": self.misses,
                "examples": len(self._rows),
                "mb": self._bytes / float(1 << 20)}

    def _signature(self, arrays, example_id):
        """Field layout a cached row must match to be reusable. A
        mismatch (fields/shape/dtype changed mid-run) re-uploads."""
        del example_id
        return tuple(sorted(
            (k, v.shape[1:], str(v.dtype)) for k, v in arrays.items()))

    def shard_batch(self, mesh, arrays, ids, tile_spatial=False):
        n = len(ids)
        assert all(v.shape[0] == n for v in arrays.values()), (
            "device cache needs batch-leading fields",
            {k: v.shape for k, v in arrays.items()})
        sig = self._signature(arrays, None)
        rows = []
        for i, eid in enumerate(ids):
            cached = self._rows.get(eid)
            if cached is not None and cached[0] == sig:
                self.hits += 1
                rows.append(cached[1])
                continue
            self.misses += 1
            # np.array COPIES: device_put is zero-copy on the CPU
            # backend, and the loader reuses its batch slot buffers —
            # an aliasing device_put would silently corrupt cached
            # rows when the next batch lands in the slot.
            host_row = {k: np.array(v[i:i + 1])
                        for k, v in arrays.items()}
            row = jax.device_put(host_row)
            nbytes = sum(v.nbytes for v in host_row.values())
            replacing = self._rows.get(eid)
            freed = (sum(v.nbytes for v in replacing[1].values())
                     if replacing is not None else 0)
            if self._bytes - freed + nbytes <= self.cap_bytes:
                self._rows[eid] = (sig, row)
                self._bytes += nbytes - freed
            elif not self._full_logged:
                logger.info(
                    "Device example cache full (%.0f MB, %d examples); "
                    "further examples stream from host each batch",
                    self._bytes / float(1 << 20), len(self._rows))
                self._full_logged = True
            rows.append(row)
        return self._assemble_batch(mesh, rows, arrays, tile_spatial)

    def _assemble_batch(self, mesh, rows, arrays, tile_spatial):
        """One jitted concat over the row pytrees, emitted directly
        into the shardings mesh.shard_batch would pick (remainder
        batches that don't divide the data axis replicate, exactly as
        there). mesh=None (single-device use, e.g. serving) skips the
        sharding constraint entirely."""
        n = len(rows)
        jit_kwargs = {}
        if mesh is not None:
            n_data = mesh.shape["data"]
            out_shardings = {}
            for k, v in arrays.items():
                if n % n_data != 0:
                    out_shardings[k] = mesh_mod.replicated(mesh)
                else:
                    out_shardings[k] = mesh_mod.batch_spec(
                        mesh, k, tile_spatial, ndim=v.ndim)
            jit_kwargs["out_shardings"] = out_shardings
        key = (id(mesh), n, tile_spatial,
               self._signature(arrays, None))
        fn = self._assemble.get(key)
        if fn is None:
            keys = sorted(arrays)

            def concat(*rws):
                return {k: jnp.concatenate([r[k] for r in rws], axis=0)
                        for k in keys}

            fn = jax.jit(concat, **jit_kwargs)
            self._assemble[key] = fn
        return fn(*rows)
