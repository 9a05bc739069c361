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
from jax.sharding import NamedSharding, PartitionSpec as P

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
        self._mh_rows = {}     # id -> (sig, {field: {device: part}})
        self._mh_layouts = {}  # signature -> (rows_of, field layouts)
        self.hits = 0
        self.misses = 0

    def stats(self):
        return {"hits": self.hits, "misses": self.misses,
                "examples": len(self._rows) + len(self._mh_rows),
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

    # ------------------------------------------------------------------
    # Multi-host: per-process local example shards, cached per TARGET
    # DEVICE SHARD and assembled into global arrays from device-resident
    # buffers (make_array_from_single_device_arrays) — the pod-slice
    # counterpart of shard_batch. Each host caches only its own example
    # slice, exactly like the GT-feature cache (feat_cache.py).
    # ------------------------------------------------------------------

    def _mh_layout(self, mesh, arrays, n, tile_spatial):
        """Per-signature shard layout: which LOCAL batch rows each
        local device holds (calibrated against the numpy assembly path
        so the global example permutation is identical to
        mesh.make_global_batch's), and each field's per-device spatial
        index + global sharding."""
        key = (id(mesh), n, tile_spatial,
               self._signature(arrays, None))
        lay = self._mh_layouts.get(key)
        if lay is not None:
            return lay
        me = jax.process_index()
        _, num_shards = mesh_mod.process_data_shard(mesh)
        gbs = n * num_shards
        ref = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")),
            np.arange(n, dtype=np.int32), global_shape=(gbs,))
        rows_of = {
            s.device: [int(r) for r in np.asarray(s.data)]
            for s in ref.addressable_shards}
        fields = {}
        for k, v in arrays.items():
            sharding = mesh_mod.batch_spec(
                mesh, k, tile_spatial, ndim=v.ndim)
            gshape = (gbs,) + v.shape[1:]
            per_dev = {
                d: idx[1:]
                for d, idx in sharding.devices_indices_map(gshape).items()
                if d.process_index == me}
            fields[k] = (sharding, gshape, per_dev)
        lay = (rows_of, fields)
        self._mh_layouts[key] = lay
        return lay

    def _mh_parts(self, fields, rows_of, arrays, i):
        """Upload local row i as its per-device shard parts."""
        parts, nbytes = {}, 0
        for k, (_sharding, _gshape, per_dev) in fields.items():
            kparts = {}
            for d, spatial_idx in per_dev.items():
                if i not in rows_of[d]:
                    continue
                part = np.array(
                    arrays[k][i:i + 1][(slice(None),) + spatial_idx])
                kparts[d] = jax.device_put(part, d)
                nbytes += part.nbytes
            parts[k] = kparts
        return parts, nbytes

    def make_global_batch(self, mesh, arrays, ids, tile_spatial=False):
        """Multi-host drop-in for mesh.make_global_batch (train path,
        replicate=False): global arrays built from cached device
        shards; examples seen before cross the host->device link never
        again."""
        n = len(ids)
        assert all(v.shape[0] == n for v in arrays.values()), (
            "device cache needs batch-leading fields",
            {k: v.shape for k, v in arrays.items()})
        _, num_shards = mesh_mod.process_data_shard(mesh)
        if (n * num_shards) % mesh.shape["data"] != 0:
            # Remainder batches replicate in the plain path; stream them.
            return mesh_mod.make_global_batch(mesh, arrays, tile_spatial)
        rows_of, fields = self._mh_layout(mesh, arrays, n, tile_spatial)
        sig = self._signature(arrays, None)
        batch_parts = []
        for i, eid in enumerate(ids):
            ent = self._mh_rows.get(eid)
            if ent is not None and ent[0] == sig:
                self.hits += 1
                batch_parts.append(ent[1])
                continue
            self.misses += 1
            parts, nbytes = self._mh_parts(fields, rows_of, arrays, i)
            freed = 0
            if ent is not None:
                freed = sum(p.nbytes for kp in ent[1].values()
                            for p in kp.values())
            if self._bytes - freed + nbytes <= self.cap_bytes:
                self._mh_rows[eid] = (sig, parts)
                self._bytes += nbytes - freed
            elif not self._full_logged:
                logger.info(
                    "Device example cache full (%.0f MB, %d examples); "
                    "further examples stream from host each batch",
                    self._bytes / float(1 << 20), len(self._mh_rows))
                self._full_logged = True
            batch_parts.append(parts)
        out = {}
        for k, (sharding, gshape, per_dev) in fields.items():
            shards = []
            for d in per_dev:
                segs = [batch_parts[i][k][d] for i in rows_of[d]]
                shard = (segs[0] if len(segs) == 1
                         else jnp.concatenate(segs, axis=0))
                shards.append(shard)
            out[k] = jax.make_array_from_single_device_arrays(
                gshape, sharding, shards)
        return out
