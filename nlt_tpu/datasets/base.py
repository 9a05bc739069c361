"""Dataset base: a threaded host input pipeline feeding static-shape
numpy batches.

Replaces the reference's tf.data pipeline (reference:
nlt/datasets/base.py:89-117: glob -> map(precache, 128 threads) ->
optional cache -> map(postcache) -> shuffle(train) -> batch -> prefetch)
with a pure-Python equivalent built for TPU feeding:

- a thread pool runs `_load_item` (PIL/numpy IO releases the GIL for the
  heavy parts), replacing tf.py_function's GIL-bound bridge
  (reference: nlt/datasets/nlt.py:106-110);
- `cache=True` keeps decoded examples in RAM, like dataset.cache();
- shuffling reshuffles example order every epoch with a per-epoch seed
  (train only), like shuffle(buffer) but over the full index;
- batches are dicts of stacked float32 numpy arrays (static shapes) plus
  host-side string lists ('id', 'nn_id'); a background prefetch thread
  keeps `prefetch_batches` batches ready so the accelerator never waits.

Subclass contract:
    _glob() -> list of example ids
    _load_item(id) -> dict of numpy arrays + str fields
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..utils import logging as logutil

logger = logutil.Logger(loggee="datasets/base")

ALLOWED_MODES = ("train", "vali", "test")


class Dataset:
    def __init__(self, config, mode, n_workers=16, prefetch_batches=2,
                 cache=None):
        self._validate_mode(mode)
        self.config = config
        self.mode = mode
        self.n_workers = n_workers
        self.prefetch_batches = prefetch_batches
        if cache is None:
            # cache = False | True/'ram' (decoded examples in RAM, like
            # tf.data cache(); reference: nlt/datasets/base.py:100-102)
            # | 'disk' (packed per-example .npz next to the data —
            # quantizes [0,1] images to uint8, ~1/4 the bytes; first
            # epoch writes, later epochs skip PNG decode entirely).
            raw = str(config.get("cache", "False")).strip().lower()
            cache = {"true": "ram", "1": "ram", "yes": "ram",
                     "ram": "ram", "disk": "disk"}.get(raw, False)
        elif cache is True:
            cache = "ram"
        self.cache_enabled = cache
        self._cache = {}
        self._cache_lock = threading.Lock()
        if cache == "disk":
            root = config.get_list("data_root")[0].rstrip("/")
            self._disk_cache_dir = "%s_cache/%s_uv%s" % (
                root, mode, config.get("uvh"))
            import os
            os.makedirs(self._disk_cache_dir, exist_ok=True)
        # Dedicated pool for per-field IO inside _load_item (separate
        # from the per-item pool to avoid nested-submission deadlock).
        self._io_pool = ThreadPoolExecutor(n_workers)
        self.files = self._glob()
        assert self.files, "No files to process into a dataset"
        self.bs = self._get_batch_size()

    @staticmethod
    def _validate_mode(mode):
        if mode not in ALLOWED_MODES:
            raise ValueError(
                "Invalid mode: %s. Allowed: %s" % (mode, ALLOWED_MODES))

    def _glob(self):
        raise NotImplementedError

    def _get_batch_size(self):
        """'bs' from config unless overridden (reference:
        nlt/datasets/base.py:61-73)."""
        if not self.config.has("bs"):
            raise ValueError(
                "Specify batch size as 'bs' in the configuration file, or "
                "override this function")
        return self.config.get_int("bs")

    def _load_item(self, id_):
        raise NotImplementedError

    # Image-like [0,1] float fields quantized to uint8 in the disk cache
    # (1/255 quantization — the sources are 8-bit PNGs anyway); warp
    # stays float16 (its on-disk precision).
    _DISK_U8_MAX_ERR = 1.0 / 255.0

    def _disk_cache_path(self, id_):
        import os
        return os.path.join(
            self._disk_cache_dir, id_.replace("/", "__") + ".npz")

    def _disk_cache_load(self, id_):
        import os
        path = self._disk_cache_path(id_)
        if not os.path.exists(path):
            return None
        item = {}
        with np.load(path, allow_pickle=False) as f:
            for k in f.files:
                v = f[k]
                if k.startswith("str_"):
                    item[k[len("str_"):]] = str(v)
                elif k.startswith("q8_"):   # quantized from float32
                    item[k[len("q8_"):]] = v.astype(np.float32) / 255.0
                elif k.startswith("q16_"):
                    item[k[len("q16_"):]] = v.astype(np.float32)
                else:                        # stored in native dtype
                    item[k] = v
        return item

    def _disk_cache_save(self, id_, item):
        path = self._disk_cache_path(id_)
        save = {}
        for k, v in item.items():
            if isinstance(v, str):
                save["str_" + k] = np.str_(v)
            elif v.dtype == np.float32 and k == "warp":
                save["q16_" + k] = v.astype(np.float16)
            elif (v.dtype == np.float32 and v.size and v.min() >= 0.0
                    and v.max() <= 1.0):
                save["q8_" + k] = np.round(v * 255.0).astype(np.uint8)
            else:
                save[k] = v  # incl. natively-uint8 device_normalize data
        # np.savez appends .npz if missing, so the tmp name must end
        # with it already.
        tmp = path + ".tmp%d.npz" % threading.get_ident()
        np.savez(tmp, **save)
        import os
        os.replace(tmp, path)

    def _load_cached(self, id_):
        if self.cache_enabled == "ram":
            with self._cache_lock:
                if id_ in self._cache:
                    return self._cache[id_]
        elif self.cache_enabled == "disk":
            item = self._disk_cache_load(id_)
            if item is not None:
                return item
        item = self._load_item(id_)
        if self.cache_enabled == "ram":
            with self._cache_lock:
                self._cache[id_] = item
        elif self.cache_enabled == "disk":
            self._disk_cache_save(id_, item)
        return item

    @staticmethod
    def _collate(items):
        """Stack numpy fields into batch arrays; strings become lists."""
        batch = {}
        for k in items[0]:
            v0 = items[0][k]
            if isinstance(v0, np.ndarray):
                batch[k] = np.stack([it[k] for it in items])
            else:
                batch[k] = [it[k] for it in items]
        return batch

    def __len__(self):
        return len(self.files)

    def n_batches(self, drop_remainder=True):
        if drop_remainder:
            return len(self.files) // self.bs
        return -(-len(self.files) // self.bs)

    def iterate(self, seed=None, no_batch=False, drop_remainder=True,
                shard_id=0, num_shards=1):
        """One epoch of batches. Train mode shuffles with `seed`.

        Multi-host: pass (jax.process_index(), jax.process_count()) so
        each host loads a disjoint slice of each (seed-synchronized)
        global shuffle and a 1/num_shards-sized local batch — the
        per-host data loading half of the distributed input pipeline
        (SURVEY.md §2.5; assembled by parallel.mesh.make_global_batch).
        """
        ids = sorted(self.files)
        if self.mode == "train":
            rng = np.random.RandomState(seed)
            rng.shuffle(ids)
        if num_shards > 1:
            ids = ids[shard_id::num_shards]
        if no_batch:
            bs = 1
        else:
            bs = self.bs
            if num_shards > 1:
                assert bs % num_shards == 0, (
                    "Global batch %d not divisible by %d hosts"
                    % (bs, num_shards))
                bs //= num_shards
        n = len(ids) if not drop_remainder else (len(ids) // bs) * bs
        if n == 0:
            n = len(ids)  # fewer examples than a batch: keep the remainder

        out_q = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.n_workers) as pool:
                    for start in range(0, n, bs):
                        if stop.is_set():
                            return
                        chunk = ids[start:start + bs]
                        items = list(pool.map(self._load_cached, chunk))
                        batch = self._collate(items)
                        if no_batch:
                            batch = {
                                k: (v[0] if isinstance(v, list) else v[0])
                                for k, v in batch.items()}
                        out_q.put(batch)
            except Exception as e:  # surface loader errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
