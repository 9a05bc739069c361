"""Device-resident example cache (parallel/device_cache.py): assembled
batches must equal mesh.shard_batch's in values AND placement, hits
must come from HBM (host mutation after caching is invisible), the
capacity cap must degrade to streaming, and the driver path must train
to the same losses with the cache on and off."""

import json
import os

import jax
import numpy as np
import pytest

from nlt_tpu.parallel import device_cache as dc_mod
from nlt_tpu.parallel import mesh as mesh_mod

UVH = 16


def make_batch(rng, n):
    def img(c, dtype=np.float32):
        return rng.uniform(0, 1, (n, UVH, UVH, c)).astype(dtype)

    return {
        "base": img(3), "warp": img(2), "rgb": img(3),
        "rgb_camspc": img(3),
        "pix_u8": (rng.uniform(0, 255, (n, UVH, UVH, 3))
                   .astype(np.uint8)),
        # 5-D n_obs field that IS tile-shardable (P('data', None, 'tile'))
        "nn_rgb": rng.uniform(
            0, 1, (n, 2, UVH, UVH, 3)).astype(np.float32),
        # 5-D field outside _SPATIAL_FIELDS (stays P('data'))
        "nn_rgb_obs": rng.uniform(
            0, 1, (n, 2, UVH, UVH, 3)).astype(np.float32),
        "meta_vec": rng.uniform(0, 1, (n, 3)).astype(np.float32),
    }


def assert_tree_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding, (
            k, a[k].sharding, b[k].sharding)


@pytest.mark.parametrize("tile_spatial", [False, True])
def test_matches_shard_batch(rng, tile_spatial):
    mesh = mesh_mod.make_mesh(n_data=4, n_tile=2)
    batch = make_batch(rng, 8)
    ids = ["e%d" % i for i in range(8)]
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    got = cache.shard_batch(mesh, batch, ids, tile_spatial)
    want = mesh_mod.shard_batch(mesh, batch, tile_spatial)
    assert_tree_equal(got, want)
    assert cache.misses == 8 and cache.hits == 0

    # Second pass: all hits, still identical.
    got2 = cache.shard_batch(mesh, batch, ids, tile_spatial)
    assert_tree_equal(got2, want)
    assert cache.hits == 8


def test_hits_come_from_device_not_host(rng):
    mesh = mesh_mod.make_mesh(n_data=4, n_tile=1)
    batch = make_batch(rng, 4)
    ids = ["a", "b", "c", "d"]
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    want = {k: np.array(v) for k, v in batch.items()}
    cache.shard_batch(mesh, batch, ids)
    # Corrupt the host buffers: cached rows must be unaffected.
    for v in batch.values():
        v[...] = 0
    got = cache.shard_batch(mesh, batch, ids)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k])


def test_remainder_batch_replicates(rng):
    """Batches not dividing the data axis replicate, like shard_batch
    (the odd-sized validation remainder path)."""
    mesh = mesh_mod.make_mesh(n_data=4, n_tile=1)
    batch = make_batch(rng, 3)
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    got = cache.shard_batch(mesh, batch, ["x", "y", "z"])
    want = mesh_mod.shard_batch(mesh, batch)
    assert_tree_equal(got, want)


def test_capacity_cap_streams(rng):
    """cap_mb=0: nothing is inserted, every pass is misses, values are
    still exact — the cache degrades to plain streaming."""
    mesh = mesh_mod.make_mesh(n_data=4, n_tile=1)
    batch = make_batch(rng, 4)
    ids = list("abcd")
    cache = dc_mod.DeviceExampleCache(cap_mb=0)
    want = mesh_mod.shard_batch(mesh, batch)
    for _ in range(2):
        got = cache.shard_batch(mesh, batch, ids)
        assert_tree_equal(got, want)
    assert cache.hits == 0 and cache.misses == 8
    assert cache.stats()["examples"] == 0


def test_mixed_cached_and_streamed_rows(rng):
    """A batch mixing cached and never-before-seen examples assembles
    correctly (rows in batch order)."""
    mesh = mesh_mod.make_mesh(n_data=2, n_tile=1)
    b1 = make_batch(rng, 2)
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    cache.shard_batch(mesh, b1, ["a", "b"])
    b2 = make_batch(rng, 2)  # fresh content for ids c, a
    # Row 1 of b2 carries id 'a': the CACHED content (from b1) must win
    # — per the contract, content is a pure function of the id, so the
    # cache serving b1's row for 'a' is the defined behavior.
    got = cache.shard_batch(mesh, b2, ["c", "a"])
    np.testing.assert_array_equal(
        np.asarray(got["rgb"][0]), b2["rgb"][0])
    np.testing.assert_array_equal(   # id 'a' was cached as b1's row 0
        np.asarray(got["rgb"][1]), b1["rgb"][0])
    assert cache.hits == 1 and cache.misses == 3


def test_signature_change_reuploads(rng):
    """If the field contract changes (shape/dtype/fields), cached rows
    are invalidated instead of served stale."""
    mesh = mesh_mod.make_mesh(n_data=2, n_tile=1)
    b1 = make_batch(rng, 2)
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    cache.shard_batch(mesh, b1, ["a", "b"])
    b2 = {k: v for k, v in make_batch(rng, 2).items()
          if k != "meta_vec"}
    got = cache.shard_batch(mesh, b2, ["a", "b"])
    np.testing.assert_array_equal(np.asarray(got["rgb"]), b2["rgb"])
    assert cache.hits == 0


def test_driver_losses_equal_cache_on_off(tmp_path):
    """End-to-end: 2-epoch driver runs with cache_device on/off write
    identical loss scalars (the cache must be invisible to training)."""
    from tests.test_trainvali import write_ini
    from nlt_tpu import trainvali

    # Build the tiny scene directly (module-scoped fixture not usable
    # across files without redeclaration).
    import subprocess
    import sys
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "sphere")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "data_gen", "synthesize.py"),
         "--outroot", root, "--n_cams", "3", "--n_lights", "3",
         "--n_test", "2", "--imh", "32", "--uvs", "32"],
        check=True, capture_output=True)

    losses = {}
    for on in (True, False):
        d = tmp_path / ("on" if on else "off")
        d.mkdir()
        ini = write_ini(
            d, root,
            cache_device=on, outroot=str(tmp_path / ("out%d" % on)))
        outdir = trainvali.main(["--config", ini])
        scalars = os.path.join(outdir, "summary_train", "scalars.jsonl")
        losses[on] = [
            json.loads(line)["value"] for line in open(scalars)
            if json.loads(line)["tag"] == "loss_train"]
    assert losses[True] == pytest.approx(losses[False], rel=1e-6)


@pytest.mark.parametrize("tile_spatial", [False, True])
def test_make_global_batch_matches_mesh(rng, tile_spatial):
    """The multi-host assembly (cached per-device shards +
    make_array_from_single_device_arrays) must equal
    mesh.make_global_batch in values and placement. Single process
    covers the device->rows and spatial-slice mapping; the true
    multi-process path runs in tests/test_multihost.py (cache_device
    defaults on there)."""
    mesh = mesh_mod.make_mesh(n_data=4, n_tile=2)
    batch = make_batch(rng, 8)
    ids = ["e%d" % i for i in range(8)]
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    got = cache.make_global_batch(mesh, batch, ids, tile_spatial)
    want = mesh_mod.make_global_batch(mesh, batch, tile_spatial)
    assert_tree_equal(got, want)
    assert cache.misses == 8 and cache.hits == 0

    # Second pass: all hits, host mutation invisible.
    saved = {k: np.array(v) for k, v in batch.items()}
    for v in batch.values():
        v[...] = 0
    got2 = cache.make_global_batch(mesh, batch, ids, tile_spatial)
    assert cache.hits == 8
    for k in saved:
        np.testing.assert_array_equal(np.asarray(got2[k]), saved[k])


@pytest.mark.parametrize("tile_spatial", [False, True])
def test_make_global_batch_survives_reshuffle(rng, tile_spatial):
    """Regression: the per-epoch shuffle moves an example to a
    different batch position — and therefore to different data-row
    devices on any host owning >1 data row. Cached shard parts are
    keyed by spatial shard (not device) and moved D2D on demand, so a
    permuted second epoch must assemble correctly from the cache
    (device-keyed storage raised KeyError here)."""
    mesh = mesh_mod.make_mesh(n_data=4, n_tile=2)
    batch = make_batch(rng, 8)
    ids = ["e%d" % i for i in range(8)]
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    cache.make_global_batch(mesh, batch, ids, tile_spatial)
    perm = np.random.RandomState(1).permutation(8)
    shuf = {k: v[perm] for k, v in batch.items()}
    got = cache.make_global_batch(
        mesh, shuf, [ids[i] for i in perm], tile_spatial)
    want = mesh_mod.make_global_batch(mesh, shuf, tile_spatial)
    assert cache.hits == 8
    assert_tree_equal(got, want)


def test_stale_signature_entry_evicted_at_cap(rng):
    """A signature-mismatched entry whose replacement doesn't fit the
    cap is evicted (it can never hit again), not left pinning HBM."""
    mesh = mesh_mod.make_mesh(n_data=2, n_tile=1)
    b1 = make_batch(rng, 2)
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    cache.shard_batch(mesh, b1, ["a", "b"])
    assert cache.stats()["examples"] == 2
    # Shrink the cap below the current usage, then change the contract.
    cache.cap_bytes = 0
    b2 = {k: v for k, v in make_batch(rng, 2).items()
          if k != "meta_vec"}
    got = cache.shard_batch(mesh, b2, ["a", "b"])
    np.testing.assert_array_equal(np.asarray(got["rgb"]), b2["rgb"])
    assert cache.stats()["examples"] == 0
    assert cache.stats()["mb"] == 0.0


def test_invalidate(rng):
    mesh = mesh_mod.make_mesh(n_data=2, n_tile=1)
    batch = make_batch(rng, 2)
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    cache.shard_batch(mesh, batch, ["a", "b"])
    cache.invalidate(["a"])
    assert cache.stats()["examples"] == 1
    cache.invalidate()
    assert cache.stats() == {
        "hits": 0, "misses": 2, "examples": 0, "mb": 0.0}


def test_full_cache_all_miss_uses_plain_path(rng):
    """At cap with a fully-uncached batch, the cache routes through
    mesh.shard_batch (no per-row copies) and still counts misses."""
    mesh = mesh_mod.make_mesh(n_data=4, n_tile=1)
    b1 = make_batch(rng, 4)
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    cache.shard_batch(mesh, b1, list("abcd"))
    cache.cap_bytes = 0  # now "full"
    b2 = make_batch(rng, 4)
    got = cache.shard_batch(mesh, b2, list("wxyz"))
    want = mesh_mod.shard_batch(mesh, b2)
    assert_tree_equal(got, want)
    assert cache.misses == 8
    # Cached ids still hit even at cap.
    got1 = cache.shard_batch(mesh, b1, list("abcd"))
    assert cache.hits == 4
    want1 = mesh_mod.shard_batch(mesh, b1)
    assert_tree_equal(got1, want1)


def test_make_global_batch_cap_streams(rng):
    mesh = mesh_mod.make_mesh(n_data=4, n_tile=1)
    batch = make_batch(rng, 4)
    cache = dc_mod.DeviceExampleCache(cap_mb=0)
    for _ in range(2):
        got = cache.make_global_batch(mesh, batch, list("abcd"))
        want = mesh_mod.make_global_batch(mesh, batch)
        assert_tree_equal(got, want)
    assert cache.hits == 0 and cache.stats()["examples"] == 0


def test_stats_accessor():
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    st = cache.stats()
    assert st == {"hits": 0, "misses": 0, "examples": 0, "mb": 0.0}


def test_duplicate_ids_upload_once(rng):
    """A batch repeating an id (Server.predict with duplicate ids)
    uploads the row once: the first occurrence's insert is visible to
    the second, values match the plain path, and the byte accounting
    equals the unique-id footprint (ADVICE r2)."""
    mesh = mesh_mod.make_mesh(n_data=2, n_tile=1)
    batch = make_batch(rng, 4)
    # Make duplicate ids carry identical content (the cache contract).
    for v in batch.values():
        v[2] = v[0]
    ids = ["a", "b", "a", "c"]
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    got = cache.shard_batch(mesh, batch, ids)
    want = mesh_mod.shard_batch(mesh, batch)
    assert_tree_equal(got, want)
    assert cache.hits == 1 and cache.misses == 3
    bytes_dup = cache.stats()["mb"]

    ref = dc_mod.DeviceExampleCache(cap_mb=64)
    uniq = {k: v[:3] for k, v in batch.items()}
    ref.shard_batch(mesh, uniq, ["a", "b", "c"])
    assert bytes_dup == ref.stats()["mb"]


def test_invalidate_ids_resets_full_notice(rng):
    """Targeted invalidation frees room, so the 'cache full' notice
    must be able to fire again on the next fill-to-cap (ADVICE r2)."""
    mesh = mesh_mod.make_mesh(n_data=2, n_tile=1)
    batch = make_batch(rng, 2)
    cache = dc_mod.DeviceExampleCache(cap_mb=64)
    cache.shard_batch(mesh, batch, ["a", "b"])
    cache.cap_bytes = cache._bytes  # exactly full
    # Mixed batch (one hit, one new row that doesn't fit) fires the
    # full notice (a fully-uncached batch takes the plain path instead).
    cache.shard_batch(mesh, make_batch(rng, 2), ["a", "d"])
    assert cache._full_logged
    cache.invalidate(["a"])
    assert not cache._full_logged
