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

Multi-host (make_global_batch): each host caches only its own example
slice, stored as per-SPATIAL-SHARD parts (keyed by the shard's index
tuple, NOT by device — the per-epoch shuffle moves an example across
the host's data-row devices, so device-keyed parts would go stale).
A cached part needed on a different local device than it lives on is
moved D2D (HBM<->HBM DMA, cheap next to a host upload) and the replica
is kept for future epochs, capacity permitting. Global arrays are
built from the device-resident shards with
jax.make_array_from_single_device_arrays.

Capacity-capped (`cache_device_mb`): once the cap is reached further
examples stream like before — a fully-uncached batch at cap routes
through the plain mesh path with no extra copies. The driver enables
the cache for batched runs; serving reuses it for repeat queries
(serve.Server.predict(batch, ids=...)).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..utils import logging as logutil
from . import mesh as mesh_mod

logger = logutil.Logger(loggee="parallel/device_cache")


def _idx_key(idx):
    """Hashable identity of a shard index tuple (slices)."""
    return tuple((s.start, s.stop, s.step) for s in idx)


class DeviceExampleCache:
    """Per-example-id HBM cache of batch field rows.

    `shard_batch(mesh, arrays, ids, tile_spatial)` is a drop-in for
    `mesh.shard_batch(mesh, arrays, tile_spatial)`;
    `make_global_batch(mesh, arrays, ids, tile_spatial)` for
    `mesh.make_global_batch(...)` (train path). Fields must all carry
    the batch axis first (the dataset contract), and content must be a
    pure function of the id — `invalidate()` drops entries if a caller
    outside that contract (e.g. a serving client editing inputs under
    a reused id) needs to refresh them.
    """

    def __init__(self, cap_mb=2048):
        self.cap_bytes = int(cap_mb) << 20
        self._rows = {}      # id -> (sig, {field: (1, ...) dev array})
        self._bytes = 0
        self._full_logged = False
        self._assemble = {}  # signature -> jitted concat
        # id -> (sig, {field: {spatial_key: {device: part}}})
        self._mh_rows = {}
        self._mh_layouts = {}
        self.hits = 0
        self.misses = 0

    def stats(self):
        return {"hits": self.hits, "misses": self.misses,
                "examples": len(self._rows) + len(self._mh_rows),
                "mb": self._bytes / float(1 << 20)}

    def invalidate(self, ids=None):
        """Drop cached entries (all of them, or the given ids)."""
        stores = (self._rows, self._mh_rows)
        if ids is None:
            for store in stores:
                store.clear()
            self._bytes = 0
            self._full_logged = False
            return
        for eid in ids:
            for store in stores:
                ent = store.pop(eid, None)
                if ent is not None:
                    self._bytes -= self._entry_bytes(ent)
                    # Freed room: the next fill-to-cap should log again.
                    self._full_logged = False

    @staticmethod
    def _entry_bytes(ent):
        total = 0
        for v in ent[1].values():
            if isinstance(v, dict):  # mh: {skey: {device: part}}
                total += sum(p.nbytes for dd in v.values()
                             for p in dd.values())
            else:
                total += v.nbytes
        return total

    def _signature(self, arrays):
        """Field layout a cached row must match to be reusable. A
        mismatch (fields/shape/dtype changed mid-run) re-uploads."""
        return tuple(sorted(
            (k, v.shape[1:], str(v.dtype)) for k, v in arrays.items()))

    def _log_full(self, store):
        if not self._full_logged:
            logger.info(
                "Device example cache full (%.0f MB, %d examples); "
                "further examples stream from host each batch",
                self._bytes / float(1 << 20), len(store))
            self._full_logged = True

    def _evict_stale(self, store, eid, ent):
        """A signature-mismatched entry can never hit again — free it
        even when its replacement doesn't fit the cap."""
        if ent is not None:
            del store[eid]
            self._bytes -= self._entry_bytes(ent)

    # ------------------------------------------------------------------
    # Single-process path
    # ------------------------------------------------------------------

    def shard_batch(self, mesh, arrays, ids, tile_spatial=False):
        n = len(ids)
        assert all(v.shape[0] == n for v in arrays.values()), (
            "device cache needs batch-leading fields",
            {k: v.shape for k, v in arrays.items()})
        sig = self._signature(arrays)
        cached = {eid: self._rows.get(eid) for eid in ids}
        all_miss = all(c is None or c[0] != sig for c in cached.values())
        if all_miss and self._bytes >= self.cap_bytes:
            # Nothing to gain: route through the plain path (one
            # device_put per field, no per-row copies). Stale
            # (signature-mismatched) entries still free their HBM.
            for eid, ent in cached.items():
                if ent is not None:
                    self._evict_stale(self._rows, eid, ent)
            self.misses += n
            if mesh is None:
                return {k: jnp.asarray(v) for k, v in arrays.items()}
            return mesh_mod.shard_batch(mesh, arrays, tile_spatial)
        rows = []
        for i, eid in enumerate(ids):
            # Fresh lookup (not the `cached` snapshot): a batch may
            # repeat an id (Server.predict with duplicate ids) and the
            # first occurrence's insert must be visible to the second,
            # or the row is uploaded twice and _bytes over-counts.
            ent = self._rows.get(eid)
            if ent is not None and ent[0] == sig:
                self.hits += 1
                rows.append(ent[1])
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
            freed = self._entry_bytes(ent) if ent is not None else 0
            if self._bytes - freed + nbytes <= self.cap_bytes:
                self._rows[eid] = (sig, row)
                self._bytes += nbytes - freed
            else:
                self._evict_stale(self._rows, eid, ent)
                self._log_full(self._rows)
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
        key = (mesh, n, tile_spatial, self._signature(arrays))
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
    # Multi-host: per-process local example shards, cached per SPATIAL
    # SHARD (position/device independent) and assembled into global
    # arrays from device-resident buffers — the pod-slice counterpart
    # of shard_batch. Each host caches only its own example slice,
    # exactly like the GT-feature cache (feat_cache.py).
    # ------------------------------------------------------------------

    def _mh_layout(self, mesh, arrays, n, tile_spatial):
        """Per-signature shard layout: which LOCAL batch rows each
        local device holds (calibrated against the numpy assembly path
        so the global example permutation is identical to
        mesh.make_global_batch's), and each field's per-device spatial
        index + global sharding."""
        key = (mesh, n, tile_spatial, self._signature(arrays))
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

    def _mh_upload(self, fields, rows_of, arrays, i):
        """Upload local row i as its spatial-shard parts, placed on the
        devices its CURRENT batch position assigns (future positions
        reuse them via D2D moves in _mh_part_on)."""
        parts, nbytes = {}, 0
        for k, (_sharding, _gshape, per_dev) in fields.items():
            kparts = {}
            for d, spatial_idx in per_dev.items():
                if i not in rows_of[d]:
                    continue
                skey = _idx_key(spatial_idx)
                host_part = np.array(
                    arrays[k][i:i + 1][(slice(None),) + spatial_idx])
                kparts.setdefault(skey, {})[d] = jax.device_put(
                    host_part, d)
                nbytes += host_part.nbytes
            parts[k] = kparts
        return parts, nbytes

    def _mh_part_on(self, ent_parts, k, spatial_idx, d):
        """The field-k part for this spatial shard, resident on device
        d — moved D2D from wherever it lives if needed, keeping the
        replica for future epochs when the cap allows."""
        by_dev = ent_parts[k][_idx_key(spatial_idx)]
        part = by_dev.get(d)
        if part is None:
            src = next(iter(by_dev.values()))
            part = jax.device_put(src, d)
            if self._bytes + part.nbytes <= self.cap_bytes:
                by_dev[d] = part
                self._bytes += part.nbytes
        return part

    def make_global_batch(self, mesh, arrays, ids, tile_spatial=False):
        """Multi-host drop-in for mesh.make_global_batch (train path,
        replicate=False): global arrays built from cached device
        shards; examples seen before cross the host->device link never
        again (a per-epoch position change costs one D2D move)."""
        n = len(ids)
        assert all(v.shape[0] == n for v in arrays.values()), (
            "device cache needs batch-leading fields",
            {k: v.shape for k, v in arrays.items()})
        _, num_shards = mesh_mod.process_data_shard(mesh)
        if (n * num_shards) % mesh.shape["data"] != 0:
            # Remainder batches replicate in the plain path; stream them.
            return mesh_mod.make_global_batch(mesh, arrays, tile_spatial)
        sig = self._signature(arrays)
        cached = {eid: self._mh_rows.get(eid) for eid in ids}
        if (all(c is None or c[0] != sig for c in cached.values())
                and self._bytes >= self.cap_bytes):
            for eid, ent in cached.items():
                if ent is not None:
                    self._evict_stale(self._mh_rows, eid, ent)
            self.misses += n
            return mesh_mod.make_global_batch(mesh, arrays, tile_spatial)
        rows_of, fields = self._mh_layout(mesh, arrays, n, tile_spatial)
        batch_parts = []
        for i, eid in enumerate(ids):
            # Fresh lookup: same duplicate-id accounting as shard_batch.
            ent = self._mh_rows.get(eid)
            if ent is not None and ent[0] == sig:
                self.hits += 1
                batch_parts.append(ent[1])
                continue
            self.misses += 1
            parts, nbytes = self._mh_upload(fields, rows_of, arrays, i)
            freed = self._entry_bytes(ent) if ent is not None else 0
            if self._bytes - freed + nbytes <= self.cap_bytes:
                self._mh_rows[eid] = (sig, parts)
                self._bytes += nbytes - freed
            else:
                self._evict_stale(self._mh_rows, eid, ent)
                self._log_full(self._mh_rows)
            batch_parts.append(parts)
        out = {}
        for k, (sharding, gshape, per_dev) in fields.items():
            shards = []
            for d, spatial_idx in per_dev.items():
                segs = [
                    self._mh_part_on(batch_parts[i], k, spatial_idx, d)
                    for i in rows_of[d]]
                shard = (segs[0] if len(segs) == 1
                         else jnp.concatenate(segs, axis=0))
                shards.append(shard)
            out[k] = jax.make_array_from_single_device_arrays(
                gshape, sharding, shards)
        return out
