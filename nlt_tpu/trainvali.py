"""Training and validation driver.

Re-design of the reference's trainvali pipeline (reference:
nlt/trainvali.py:48-251) on the JAX mesh runtime:

    python -m nlt_tpu.trainvali --config=<ini> [--debug] [--device=...]

Kept: the .ini config system with xname-derived output dirs (:59-71),
train/vali dataset construction with holdout split, AMSGrad(+clipnorm)
optimization, per-epoch loop with ckpt_period checkpointing,
vis_train_batches visualization + HTML compilation, vali_period
validation on a fixed set of batches, and keep_recent_epochs retention
for both checkpoints and vis dirs (:328-332).

Changed (and why):
- tf.distribute.MirroredStrategy -> a ('data', 'tile') jax Mesh with a
  single jitted train step (parallel/train.py); gradient all-reduce is
  compiler-inserted over ICI instead of NCCL;
- tf.summary/TensorBoard -> plain JSONL scalar logs next to the vis
  HTML (summary_*/scalars.jsonl), since the framework is TF-free; the
  HTML galleries remain the primary visual artifact;
- tf.train.Checkpoint -> Orbax over the full state pytree, which now
  *includes* the robust-loss latents (SURVEY.md §5 quirk fixed);
- the epoch counter lives in the checkpoint step number, as before.
"""

import argparse
import json
import os
import time
from collections import deque
from glob import glob
from os.path import dirname, exists, join
from shutil import copyfile, rmtree

import jax
import jax.numpy as jnp
import numpy as np

from . import datasets as datasets_mod
from . import models as models_mod
from .parallel import mesh as mesh_mod
from .parallel import train as train_mod
from .utils import checkpoint as ckpt_mod
from .utils import config as config_mod
from .utils import img as imgutil
from .utils import io as ioutil
from .utils import logging as logutil

logger = logutil.Logger(loggee="trainvali")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="config.ini",
                   help="a .ini file in nlt_tpu/config/ or a full path")
    p.add_argument("--debug", action="store_true",
                   help="truncate every epoch after one batch")
    p.add_argument("--set", action="append", default=[],
                   dest="overrides", metavar="KEY=VALUE",
                   help="override a config key (repeatable), e.g. "
                        "--set epochs=250 --set n_obs=3. Overrides "
                        "apply before xname expansion, and the "
                        "EFFECTIVE config is snapshotted next to the "
                        "outdir, so nlt_test/serve see them. (The "
                        "reference's only per-run knobs are its three "
                        "fixed flags; nlt/trainvali.py:38-43.)")
    p.add_argument("--device", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="cpu forces the host backend")
    p.add_argument("--n_tile", type=int, default=1,
                   help="devices along the texel-tile mesh axis")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of a few early "
                        "training steps (to <outdir>/profile)")
    # Multi-host bring-up (one process per host on a pod slice;
    # SURVEY.md §2.5's TPU-native equivalent of distributed training).
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args(argv)


def resolve_config_path(config_flag):
    if exists(config_flag):
        return config_flag
    return join(dirname(__file__), "config", config_flag)


def strip_host_fields(batch):
    """Split a batch into (device arrays, host metadata)."""
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
    meta = {k: v for k, v in batch.items() if isinstance(v, list)}
    return arrays, meta


class ScalarWriter:
    """JSONL scalar logs (the TensorBoard replacement)."""

    def __init__(self, outdir):
        os.makedirs(outdir, exist_ok=True)
        self.path = join(outdir, "scalars.jsonl")

    def scalar(self, tag, value, step):
        with open(self.path, "a") as h:
            h.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "wall_time": time.time()}) + "\n")

    def text(self, tag, value, step):
        self.scalar("text/" + tag, 0.0, step)
        with open(self.path, "a") as h:
            h.write(json.dumps(
                {"tag": tag, "text": str(value), "step": int(step)}) + "\n")


def maintain_epoch_queue(queue_, new_epoch_dir):
    """Keep only the most recent epoch vis dirs
    (reference: nlt/trainvali.py:328-332)."""
    queue_.appendleft(new_epoch_dir)
    for epoch_dir in glob(join(dirname(new_epoch_dir), "*")):
        if epoch_dir not in queue_:
            rmtree(epoch_dir, ignore_errors=True)


# XLA's flat row gather degrades ~3.5x once a 512^2 resampler take
# exceeds this many rows (ops/resample.py; RESULTS.md batch-scaling —
# a bs-8 512^2 step COLLAPSES 33.8 -> 110.7 ms). Measured round 5: the
# collapse does NOT reproduce at 1024^2/bs 4 (4.2M rows, only ~6%
# slower unfenced — tools/bench_1024.py), so it is not a pure
# rows-per-take threshold; the fence stays because microbatching is
# measured-optimal there anyway (equal speed, 3x smaller temp HBM).
GATHER_CLIFF_ROWS = 1_500_000


def fence_grad_accum(config, n_devices, n_tile=1):
    """Keep per-device microbatches under the resampler gather cliff.

    If the per-device microbatch would cross ~1.5M resample rows and
    the user didn't set grad_accum explicitly, auto-raise it (scanned
    microbatches give the IDENTICAL gradient; parallel/train.py); if
    the user DID pin grad_accum, warn loudly but respect the setting.
    Returns the grad_accum to use.
    """
    grad_accum = config.get_int("grad_accum", 1)
    n_data_devices = max(1, n_devices // max(n_tile, 1))
    bs_total = config.get_int("bs")

    def micro_rows(n_micro):
        per_dev_bs = max(1, (bs_total // n_micro) // n_data_devices)
        return (per_dev_bs * config.get_int("uvh")
                * config.get_int("uvw"))

    if micro_rows(grad_accum) > GATHER_CLIFF_ROWS:
        if config.has("grad_accum"):
            logger.warn(
                "Per-device microbatch (%d resample rows) exceeds the "
                "~1.5M-row gather cliff; this step will run ~3x slow. "
                "Raise grad_accum to stay under it.",
                micro_rows(grad_accum))
        else:
            # Smallest divisor of bs that fences the microbatch (any
            # divisor, not just powers of two: bs=6 over the cliff
            # auto-fences at 2).
            auto = next(
                (d for d in range(grad_accum + 1, bs_total + 1)
                 if bs_total % d == 0
                 and micro_rows(d) <= GATHER_CLIFF_ROWS), None)
            if auto is not None:
                logger.warn(
                    "Auto-set grad_accum=%d: per-device bs %d at %dx%d "
                    "UV crosses the ~1.5M-row gather cliff; scanned "
                    "microbatches keep the identical gradient at full "
                    "speed (set grad_accum explicitly to override).",
                    auto, bs_total // n_data_devices,
                    config.get_int("uvh"), config.get_int("uvw"))
                grad_accum = auto
            else:
                logger.warn(
                    "No divisor of bs=%d keeps the per-device "
                    "microbatch under the ~1.5M-row gather cliff; "
                    "this step will run ~3x slow.", bs_total)
    return grad_accum


def main(argv=None):
    args = parse_args(argv)
    if args.debug:
        logger.warn("Debug mode: On")
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the flagship step takes ~40 s to
    # compile; cache it across runs/restarts.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("NLT_TPU_COMPILE_CACHE",
                           "/tmp/nlt_tpu_compile_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # older jax without the knobs
        logger.warn("No persistent compilation cache: %s", e)

    # Multi-host: must run before any other JAX call.
    mesh_mod.initialize_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id)
    is_multiprocess = jax.process_count() > 1

    config_ini = resolve_config_path(args.config)

    # Preemption-safe shutdown: TPU pod workers get SIGTERM with a
    # short grace window. On the first SIGTERM the driver finishes the
    # in-flight batch, checkpoints, and exits cleanly (resume replays
    # the interrupted epoch from the saved — fresher — params); a
    # second SIGTERM falls through to the default handler. Installed
    # EARLY so a signal during setup is also caught (the first batch
    # then saves and exits). Multi-host: signal delivery is
    # asynchronous, so the per-batch exit decision is agreed across
    # processes with a tiny allgather (a one-batch skew would
    # deadlock the collective save). The reference has no preemption
    # story.
    import signal

    preempt = {"flag": False}

    def _on_sigterm(signum, frame):
        logger.warn(
            "SIGTERM: will checkpoint after the in-flight batch and "
            "exit (send again to kill)")
        preempt["flag"] = True
        signal.signal(signal.SIGTERM, signal.SIG_DFL)

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # non-main thread (embedded use): no handler

    config = config_mod.read_config(config_ini)
    base_dict = dict(config.to_dict())

    def apply_overrides(cfg):
        for kv in args.overrides:
            assert "=" in kv, (
                "--set expects KEY=VALUE, got %r" % kv)
            k, v = kv.split("=", 1)
            cfg.set(k.strip(), v.strip())

    apply_overrides(config)

    # Output directory from the xname template
    # (reference: trainvali.py:62-71).
    xname = config.xname()
    outroot = config.get("outroot")
    outdir = join(outroot, xname)
    overwrite = config.get_bool("overwrite")
    snapshot_f = outdir.rstrip("/") + ".ini"
    # Drift check on host 0 only: other processes could race host 0's
    # concurrent snapshot rewrite below (truncated read -> spurious
    # warning or parse error before the sync barrier).
    if (jax.process_index() == 0 and not overwrite
            and os.path.isfile(snapshot_f)):
        # Resuming an existing run: this command's config (base ini +
        # --set) wins — edit-and-continue (e.g. raising `epochs`) is
        # the reference's documented resume workflow — but any drift
        # from the config the checkpoint was actually trained under
        # (the outdir snapshot, e.g. a --set flag omitted on the
        # resume command) is surfaced LOUDLY, not silently absorbed.
        snap = config_mod.read_config(snapshot_f)
        if snap.to_dict() != config.to_dict():
            changed = sorted(
                k for k in set(snap.to_dict()) | set(config.to_dict())
                if snap.to_dict().get(k) != config.to_dict().get(k))
            logger.warn(
                "Resuming with a DIFFERENT config than this run was "
                "started with (keys: %s; recorded snapshot: %s). "
                "Continuing with the new values and updating the "
                "snapshot — if unintended (e.g. a --set flag omitted "
                "on resume), re-run with the recorded values.",
                ", ".join(changed), snapshot_f)
    if jax.process_index() == 0:
        # Host 0 owns outdir preparation: a concurrent rmtree from
        # every host of a pod slice would race the others' writes.
        ioutil.prepare_outdir(outdir, overwrite=overwrite)
        if config.to_dict() == base_dict:
            # Plain copy preserves the source file's comments.
            copyfile(config_ini, snapshot_f)
        else:
            # Snapshot the EFFECTIVE config (the ckpt->ini contract
            # nlt_test/serve restore from must include overrides and
            # resumed-run reconciliation).
            config.save(snapshot_f)
    if is_multiprocess:
        # Everyone waits for host 0's (possibly destructive) prep
        # before touching the shared tree.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("nlt_tpu:outdir_prep")
        os.makedirs(outdir, exist_ok=True)
    logger.info("For results, see:\n\t%s", outdir)

    # Multi-host preemption agreement: all processes must reach the
    # collective save together, so the exit decision is agreed via a
    # tiny process_allgather at deterministic points. Fetching that
    # value costs a host round trip (~25-30 ms on tunneled deployments
    # — comparable to the ~40 ms step itself), so the train loop only
    # syncs every preempt_sync_batches (default 8: ~0.3 s worst-case
    # extra preemption latency against grace windows of seconds)
    # instead of defeating async-dispatch pipelining on every batch.
    # Single-process runs check the local flag every batch for free.
    # The flag is ALSO agreed per validation batch and at every epoch
    # boundary, so a SIGTERM landing during the vali/vis pass or the
    # epoch tail is acted on there instead of waiting for the next
    # epoch's train loop.
    preempt_sync = max(1, config.get_int("preempt_sync_batches", 8))

    def preempt_agreed():
        stop = preempt["flag"]
        if is_multiprocess:
            from jax.experimental import multihost_utils
            stop = bool(np.max(multihost_utils.process_allgather(
                np.asarray([stop], np.int32))))
        return stop

    # grad_accum=N scans N sequential microbatches of bs/N inside the
    # jitted step and applies ONE averaged update — the bs gradient at
    # the microbatch's memory/gather footprint (parallel/train.py).
    grad_accum = fence_grad_accum(
        config, n_devices=len(jax.devices()), n_tile=args.n_tile)
    if grad_accum > 1:
        assert config.get_int("bs") % grad_accum == 0, \
            "bs must be divisible by grad_accum"
        logger.info("Gradient accumulation: %d microbatches of %d",
                    grad_accum, config.get_int("bs") // grad_accum)

    # Mesh over all devices: data-parallel batch axis (+ optional tile),
    # clamped so the data axis divides the (micro)batch size.
    mesh = mesh_mod.make_mesh(
        n_tile=args.n_tile,
        batch_size=config.get_int("bs") // grad_accum)
    logger.info("Mesh: %s over %d devices", mesh.shape, len(jax.devices()))
    tile_spatial = args.n_tile > 1

    # Datasets
    dataset_name = config.get("dataset")
    Dataset = datasets_mod.get_dataset_class(dataset_name)
    dataset_train = Dataset(config, "train")
    no_batch = config.get_bool("no_batch", False)
    try:
        dataset_vali = Dataset(config, "vali")
    except (FileNotFoundError, AssertionError) as e:
        logger.warn("No validation data: %s", e)
        dataset_vali = None

    # Fixed validation batches (reference: trainvali.py:98-111).
    vali_batches = None
    if dataset_vali is not None:
        n_vali_batches = config.get_int("vali_batches", -1)
        vali_batches = []
        for i, b in enumerate(
                dataset_vali.iterate(seed=0, drop_remainder=False)):
            if 0 <= n_vali_batches <= i:
                break
            vali_batches.append(b)

    # Model + optimizer + state
    model_name = config.get("model")
    ModelCls = models_mod.get_model_class(model_name)
    model = ModelCls(config)
    lr = config.get_float("lr")
    mgm = config.get_float("mgm", -1)
    tx = train_mod.make_optimizer(lr, mgm)
    # ema_decay > 0 keeps an exponential moving average of the params
    # in the state (checkpointed); validation/serving prefer it.
    ema_decay = config.get_float("ema_decay", 0.0)
    state = train_mod.init_state(
        model, tx, jax.random.PRNGKey(0), ema_decay=ema_decay)
    state = jax.device_put(state, mesh_mod.replicated(mesh))

    # Checkpoint restore (epoch counter in the ckpt step number).
    ckptdir = join(outdir, "checkpoints")
    keep_recent = config.get_int("keep_recent_epochs", -1)
    # keep_best (default on): retention protects the best-psnr_vali
    # epoch in ADDITION to the recency window, so the documented
    # --step=best workflow survives long runs that drift past their
    # best epoch (utils/checkpoint.py prune()).
    keep_best = config.get_bool("keep_best", True)
    manager = ckpt_mod.CheckpointManager(
        ckptdir, max_to_keep=keep_recent,
        keep_best_metric="psnr_vali" if keep_best else None)
    state, epoch_restored = manager.restore(state)

    # Warm start / fine-tuning: `init_from = <other outdir>/checkpoints`
    # seeds the PARAMS (incl. loss latents and EMA) from another run's
    # checkpoint when this run has none of its own. The convnet is
    # resolution-agnostic (k=s=2 stages at any uvh), so a low-res run
    # can seed a high-res one (progressive training) and a trained
    # scene can seed a new scene. The optimizer state and epoch
    # counter start fresh — it is a new run, not a resume.
    init_from = config.get("init_from", "")
    # Gate on "this run has NO checkpoint" via latest_step, not the
    # restored epoch number: a preemption save during epoch 0 lands at
    # step 0, and epoch_restored == 0 would mistake it for a fresh run
    # and silently overwrite the preempted params with init_from's.
    if init_from and manager.latest_step() is None:
        if not os.path.isdir(init_from):
            # Check BEFORE constructing a manager: Orbax eagerly mkdirs
            # the path, so a typo would leave a spurious empty
            # checkpoint tree behind.
            raise FileNotFoundError(
                "init_from checkpoint dir not found: %s" % init_from)
        src = ckpt_mod.CheckpointManager(init_from)
        try:
            assert src.latest_step() is not None, (
                "init_from has no checkpoint: %s" % init_from)
            seeded, src_step = src.restore(state)
        except AssertionError:
            raise
        except Exception as e:
            raise ValueError(
                "init_from checkpoint at %s does not match this run's "
                "state structure (network hyperparameters, loss "
                "latents, ema_decay, and optimizer must agree; "
                "resolution/scene/lr may differ): %s"
                % (init_from, e)) from e
        finally:
            src.close()
        state = dict(state, params=seeded["params"],
                     **({"ema": seeded["ema"]} if "ema" in seeded
                        and "ema" in state else {}))
        state = jax.device_put(state, mesh_mod.replicated(mesh))
        logger.info("Warm-started params from %s (step %d)",
                    init_from, src_step)

    # nan_guard=True keeps params/opt_state unchanged on any step whose
    # loss or gradients are non-finite (the loss still reaches the
    # scalar logs) — failure detection the reference lacks (SURVEY §5).
    nan_guard = config.get_bool("nan_guard", False)
    train_step = train_mod.make_train_step(
        model, tx, mesh=mesh, tile_spatial=tile_spatial,
        grad_accum=grad_accum, nan_guard=nan_guard, ema_decay=ema_decay)
    eval_step = train_mod.make_eval_step(
        model, mesh=mesh, tile_spatial=tile_spatial)

    # Static per-example cache: gt loss features (LPIPS taps) and warp
    # products (gt_camspc/base_camspc) depend only on static data, so
    # after the first epoch they are read from HBM instead of recomputed
    # — identical loss/gradients (parallel/feat_cache.py). Knob:
    # cache_static (defaults to lpips_cache_gt for config compat).
    # Single-process data-parallel only.
    feat_cache = None
    from .models.base import Model as _BaseModel
    overrides_statics = (
        type(model).static_products is not _BaseModel.static_products)
    if (config.get_bool("cache_static",
                        config.get_bool("lpips_cache_gt", False))
            and hasattr(model, "feat_loss_indices")
            and (model.feat_loss_indices() or overrides_statics)):
        if tile_spatial or no_batch:
            # Tile sharding would need the cached images re-split per
            # spatial shard; not worth it until a real tile pod exists.
            logger.warn(
                "cache_static disabled (tile-sharded/no_batch run)")
        else:
            from .parallel import feat_cache as feat_cache_mod
            feat_cache = feat_cache_mod.GTFeatureCache(
                dataset_train.files,
                cap_mb=config.get_int("cache_static_mb", 6144))
            train_step_cached = train_mod.make_train_step(
                model, tx, mesh=mesh, tile_spatial=tile_spatial,
                cached_statics=True, grad_accum=grad_accum,
                nan_guard=nan_guard, ema_decay=ema_decay)
            extract_statics = train_mod.make_static_extractor(model)
            if is_multiprocess:
                # Multi-host: each host extracts and caches ITS OWN
                # example slice on its local device(s), against a
                # frozen params snapshot (everything the extractor
                # touches — warp products and the frozen LPIPS
                # features — is params-static for the whole run); the
                # global statics arrays are assembled per batch like
                # the data itself (mesh.make_global_tree).
                _params_np = jax.tree.map(
                    lambda a: np.asarray(a), state["params"])
                extract_params_local = jax.device_put(
                    _params_np, jax.local_devices()[0])
                del _params_np

    # Device-resident example cache: every batch field is static per
    # example id, so from epoch 1 on batches are assembled on-device
    # from HBM-cached rows instead of re-crossing the host->device
    # link (parallel/device_cache.py). Identical values and shardings
    # to mesh.shard_batch. Knobs: cache_device (default on),
    # cache_device_mb (insertion cap; full cache = stream as before).
    device_cache = None
    if config.get_bool("cache_device", True) and not no_batch:
        from .parallel import device_cache as device_cache_mod
        device_cache = device_cache_mod.DeviceExampleCache(
            cap_mb=config.get_int("cache_device_mb", 2048))

    # Summary writers + vis dir templates (reference: trainvali.py:144-161).
    writer_train = ScalarWriter(join(outdir, "summary_train"))
    writer_vali = ScalarWriter(join(outdir, "summary_vali"))
    train_vis_epoch_dir = join(outdir, "vis_train", "epoch{e:09d}")
    vali_vis_epoch_dir = join(outdir, "vis_vali", "epoch{e:09d}")
    keep = keep_recent if keep_recent > 0 else None
    train_deque = deque([], keep)
    vali_deque = deque([], keep)
    # On resume, seed the retention queues from the vis dirs already on
    # disk — a fresh (empty) deque would otherwise evict every prior
    # epoch's vis on the first new write, violating keep_recent_epochs.
    for q, template in ((train_deque, train_vis_epoch_dir),
                        (vali_deque, vali_vis_epoch_dir)):
        for d in sorted(glob(join(dirname(template), "epoch*"))):
            q.appendleft(d)

    epochs = config.get_int("epochs")
    vis_train_batches = config.get_int("vis_train_batches", 4)
    ckpt_period = config.get_int("ckpt_period", 1)
    vali_period = config.get_int("vali_period", 1)
    # Raw-batch pickles are opt-in like the reference's
    # (reference: nlt/models/nlt.py:271-272 defaults dump_raw_to=None).
    dump_raw = config.get_bool("vis_dump_raw", False)

    # Vis outputs leave the device once per vis batch; on thin-host /
    # tunneled deployments that transfer dominates the epoch wall time
    # (~75 MB/batch as f32 at 512^2 over a ~35 MB/s link). Quantize on
    # device first (imgutil.pack_vis); pred/gt (UV-space, only used by
    # raw dumps) are dropped unless dump_raw.
    is_linear = config.get_bool("linear_space")
    pack_vis = jax.jit(
        lambda tv: imgutil.pack_vis(tv, linear_space=is_linear))

    # Host-side cache of the STATIC vis fields (base/nn/gt in camera
    # space never change for a given example): steady-state epochs only
    # pull the prediction off the device — on a tunneled host that cuts
    # the per-vis-batch transfer another ~4x on top of the packing.
    _static_vis = ("base_camspc", "nn_camspc", "gt_camspc")
    # Bounded LRU so shuffled train vis batches cannot grow it without
    # limit over long runs (~2.4 MB/example at 512^2) and a >cap vis
    # rotation still hits on recently-seen examples (insertion-order
    # FIFO degenerated there: it evicted the example it just re-used).
    _VIS_CACHE_CAP = 256
    vis_host_cache = {}  # id -> statics; dict preserves insert order

    def stage_vis(to_vis, meta):
        """Pack on device and START the device->host copy of the
        fields that must leave the device, WITHOUT blocking
        (copy_to_host_async): the transfer overlaps the remaining
        train/eval steps, and materialize_vis at vis-writing time
        finds the bytes already staged. Cache-hit statics are
        resolved here (host refs held in the staged dict) so LRU
        eviction between stage and materialize cannot lose them."""
        if not dump_raw:
            to_vis = {k: v for k, v in to_vis.items()
                      if k not in ("pred", "gt")}
        packed = pack_vis(to_vis)
        ids = meta.get("id")
        statics_present = [k for k in _static_vis if k in packed]
        hit = bool(ids) and all(i in vis_host_cache for i in ids)
        if hit:
            fetch = {k: v for k, v in packed.items()
                     if k not in _static_vis}
            cached = {k: np.stack([vis_host_cache[i][k] for i in ids])
                      for k in statics_present}
            for i in ids:  # refresh recency
                vis_host_cache[i] = vis_host_cache.pop(i)
        else:
            fetch, cached = dict(packed), None
        for v in fetch.values():
            try:
                v.copy_to_host_async()
            except Exception:
                pass  # backend without async staging: plain fetch later
        return {"_staged": True, "fetch": fetch, "cached": cached,
                "ids": ids, "statics_present": statics_present,
                "meta": meta}

    def materialize_vis(staged):
        """Complete a stage_vis: one coalesced device_get (per-field
        np.asarray would pay a tunnel round trip each), then the
        statics-cache bookkeeping. Pass-through for already-host
        dicts (the multi-process local-shard path)."""
        if not (isinstance(staged, dict) and staged.get("_staged")):
            return staged
        out = jax.device_get(staged["fetch"])
        ids = staged["ids"]
        if staged["cached"] is not None:
            out.update(staged["cached"])
        elif ids:
            for j, i in enumerate(ids):
                vis_host_cache.pop(i, None)  # re-insert as newest
                vis_host_cache[i] = {
                    k: out[k][j] for k in staged["statics_present"]}
            while len(vis_host_cache) > _VIS_CACHE_CAP:
                vis_host_cache.pop(next(iter(vis_host_cache)))
        out.update(staged["meta"])
        return out

    def fetch_vis_local(to_vis):
        """Multi-host train vis: train batches are data-sharded, so no
        host can fetch the full batch — but every host CAN fetch its
        own addressable rows (its loader's examples: make_global_batch
        places local rows at this process's device positions, in
        order). ALL hosts must call this (pack_vis on a global array
        is a multi-host XLA program); host 0 writes its shard's vis."""
        if not dump_raw:
            to_vis = {k: v for k, v in to_vis.items()
                      if k not in ("pred", "gt")}
        packed = pack_vis(to_vis)
        out = {}
        for k, v in packed.items():
            seen, parts = set(), []
            for s in sorted(v.addressable_shards,
                            key=lambda s: (s.index[0].start or 0)):
                start = s.index[0].start or 0
                if start in seen:  # replicated field: one copy
                    continue
                seen.add(start)
                parts.append(np.asarray(s.data))
            out[k] = np.concatenate(parts, axis=0)
        return out

    # Optional profiler capture of steps 2..5 of the first epoch
    # (step 1 is compile; SURVEY.md §5: the reference has no profiler
    # hooks, only wall-clock batch times).
    profile_state = {"on": False, "done": not args.profile}

    # Upload/step overlap: place batch i+1 (host->device transfer +
    # device-cache insert/assembly) on a worker thread while batch i's
    # extraction + train step run. Placement order is unchanged (one
    # worker, depth-1 queue), so losses are identical. MEASURED AND
    # DEFAULTED OFF on this deployment (interleaved 2x A/B on the real
    # chip, 512^2 cold epochs): the tunnel's PJRT client serializes
    # RPCs from concurrent threads, so threaded placement ran 4-20x
    # SLOWER (13.2/29.4 s/batch vs 3.5/1.5 synchronous); and because
    # step dispatch is already async, the plain loop ALREADY overlaps
    # device compute with the next batch's host work — with a 0.06 s
    # step against 1.5-3.5 s of wire time there is no 2x to win here.
    # The knob remains for direct-attached TPU hosts, where H2D copy
    # engines overlap compute and a second thread does not share an
    # RPC channel. Knob: prefetch_batches (default 0 = synchronous).
    prefetch_depth = config.get_int("prefetch_batches", 0)

    def place(batch):
        arrays, meta = strip_host_fields(batch)
        local_arrays = arrays
        if is_multiprocess:
            if device_cache is not None:
                # Per-host device shards (each host caches only its
                # own example slice; parallel/device_cache.py).
                arrays = device_cache.make_global_batch(
                    mesh, arrays, batch["id"], tile_spatial)
            else:
                arrays = mesh_mod.make_global_batch(
                    mesh, arrays, tile_spatial)
        elif device_cache is not None:
            arrays = device_cache.shard_batch(
                mesh, arrays, batch["id"], tile_spatial)
        else:
            arrays = mesh_mod.shard_batch(mesh, arrays, tile_spatial)
        return arrays, local_arrays, meta, batch["id"]

    place_pool = None
    if prefetch_depth > 0:
        from concurrent.futures import ThreadPoolExecutor
        place_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="nlt_place")

    def shutdown_place_pool():
        """Drop queued placements so a pending upload cannot delay
        process exit (the preemption path returns mid-epoch)."""
        if place_pool is not None:
            place_pool.shutdown(wait=False, cancel_futures=True)
            import atexit
            atexit.unregister(shutdown_place_pool)

    if place_pool is not None:
        # Exceptions/interpreter exit also release the worker; every
        # normal/preempt return calls shutdown_place_pool, which
        # unregisters itself — repeated main() calls (test suites,
        # notebooks) don't accumulate callbacks.
        import atexit
        atexit.register(shutdown_place_pool)

    def placed_batches(batch_iter):
        """Yield place(batch) results, keeping up to prefetch_depth
        batches queued ahead (one placement worker: placement order —
        and therefore every loss — is unchanged)."""
        if place_pool is None:
            for b in batch_iter:
                yield place(b)
            return
        futs = deque()
        for b in batch_iter:
            futs.append(place_pool.submit(place, b))
            if len(futs) > prefetch_depth:
                yield futs.popleft().result()
        while futs:
            yield futs.popleft().result()

    for epoch_i in range(epoch_restored, epochs):
        # ---- train over all batches ----
        batch_loss, batch_vis, batch_time = [], [], []
        epoch_t0 = time.time()
        # Example sharding follows the mesh's data axis only: hosts
        # that differ only along 'tile' load the SAME examples and
        # contribute their devices' spatial slices (parallel/mesh.py).
        data_shard_id, data_num_shards = mesh_mod.process_data_shard(
            mesh)
        for batch_i, (arrays, local_arrays, meta, batch_ids) in enumerate(
                placed_batches(dataset_train.iterate(
                    seed=epoch_i, no_batch=no_batch,
                    shard_id=data_shard_id,
                    num_shards=data_num_shards))):
            if not profile_state["done"] and batch_i == 1:
                jax.profiler.start_trace(join(outdir, "profile"))
                profile_state["on"] = True
            t0 = time.time()
            if feat_cache is not None:
                # Extract-then-step, even on first sight of an example:
                # the cached step skips exactly the work the extractor
                # just did (the uncached step would REPEAT the fg/base
                # resamples and gt LPIPS taps), and the uncached train
                # program never needs compiling at all. Loss params are
                # frozen, so extraction timing vs the update is moot.
                if is_multiprocess:
                    # Per-host cache over this host's example slice;
                    # global statics assembled like the batch itself.
                    if feat_cache.has_all(batch_ids):
                        local_statics = feat_cache.gather(batch_ids)
                    else:
                        local_statics = extract_statics(
                            extract_params_local, local_arrays)
                        if feat_cache.insert(batch_ids, local_statics):
                            local_statics = feat_cache.gather(
                                batch_ids)
                        # else: capacity-capped rows feed the freshly
                        # extracted statics directly.
                    statics = mesh_mod.make_global_tree(
                        mesh, local_statics)
                else:
                    if feat_cache.has_all(batch_ids):
                        statics = feat_cache.gather(batch_ids)
                    else:
                        statics = extract_statics(
                            state["params"], arrays)
                        if feat_cache.insert(batch_ids, statics):
                            statics = feat_cache.gather(batch_ids)
                state, loss, to_vis = train_step_cached(
                    state, arrays, statics)
            else:
                state, loss, to_vis = train_step(state, arrays)
            # Don't block on the loss here: dispatch is async, so the
            # host thread goes straight back to feeding data while the
            # device crunches (the reference blocks implicitly in eager
            # mode every step). Losses are fetched at epoch end.
            batch_time.append(time.time() - t0)
            if profile_state["on"] and batch_i >= 4:
                jax.profiler.stop_trace()
                profile_state.update(on=False, done=True)
                logger.info(
                    "Profiler trace written to %s",
                    join(outdir, "profile"))
            batch_loss.append(loss)
            # Fetch train vis only on epochs that will write it (the
            # ckpt_period gate below) — the device->host transfer is
            # the expensive part on thin hosts. On pod slices train
            # batches are data-sharded: host 0 vises ITS addressable
            # shard (its own loader's examples). Tile-sharded runs
            # still skip train vis (no host holds full images); vali
            # vis (replicated batches) covers those.
            if (batch_i < vis_train_batches
                    and (epoch_i + 1) % ckpt_period == 0):
                if not is_multiprocess:
                    # Staged, not fetched: the async copy overlaps the
                    # remaining batches' compute instead of stalling
                    # dispatch mid-epoch; materialized at vis-writing.
                    batch_vis.append(stage_vis(to_vis, meta))
                elif not tile_spatial:
                    local_vis = fetch_vis_local(to_vis)
                    if jax.process_index() == 0:
                        local_vis.update(meta)
                        batch_vis.append(local_vis)
            # All processes reach the agreement at the same batch
            # index (same cadence), so they observe the flag together
            # even when the signal lands between two hosts' checks.
            if ((not is_multiprocess
                 or (batch_i + 1) % preempt_sync == 0)
                    and preempt_agreed()):
                float(loss)  # realize the in-flight step (honest sync)
                saved = manager.save(epoch_i, state, force=True)
                manager.wait()
                manager.close()
                shutdown_place_pool()
                logger.warn(
                    "Preempted at epoch %d batch %d; checkpointed "
                    "to\n\t%s", epoch_i + 1, batch_i, saved)
                return outdir
            if args.debug:
                logger.warn("Debug mode: Skipping the rest of this epoch")
                break
        if profile_state["on"]:
            # Fewer batches than the capture window: close the trace at
            # epoch end instead of re-entering start_trace next epoch.
            jax.profiler.stop_trace()
            profile_state.update(on=False, done=True)
            logger.info(
                "Profiler trace written to %s", join(outdir, "profile"))
        assert batch_time, "Dataset is empty"
        # Sync once per epoch: realize the deferred losses in ONE
        # batched transfer. Per-scalar float() pays a full tunnel
        # round trip EACH on remote PJRT clients (~23 ms measured,
        # tools/bench_loop.py — 15 of them cost ~9 train steps);
        # device_get on the list coalesces the fetches. batch_time
        # entries are async dispatch times; the honest per-batch
        # figure is epoch wall time / batches.
        batch_loss = [float(x) for x in jax.device_get(batch_loss)]
        n_bad = sum(1 for x in batch_loss if not np.isfinite(x))
        if n_bad:
            logger.warn(
                "%d/%d batches had non-finite loss%s", n_bad,
                len(batch_loss),
                " (updates skipped: nan_guard)" if nan_guard
                else " (set nan_guard=True to skip such updates)")
        batch_time = [(time.time() - epoch_t0) / len(batch_time)]

        step = epoch_i + 1

        # ---- checkpoint + train summaries/vis ----
        if step % ckpt_period == 0:
            # All processes participate in the save (Orbax multi-host
            # contract); vis/scalars are host-0 only.
            saved = manager.save(step, state)
            logger.info("Checkpointed epoch %d:\n\t%s", step, saved)
        if step % ckpt_period == 0 and jax.process_index() == 0:
            writer_train.scalar(
                "loss_train", float(np.mean(batch_loss)), step)
            writer_train.scalar(
                "batch_time_train", float(np.mean(batch_time)), step)
            # Texels/sec/chip: the TPU-native speed metric (SURVEY.md §5).
            texels = (config.get_int("bs") * config.get_int("uvh")
                      * config.get_int("uvw"))
            writer_train.scalar(
                "texels_per_sec",
                texels / float(np.mean(batch_time)), step)
            vis_dirs = []
            for batch_i, to_vis in enumerate(batch_vis):
                to_vis = materialize_vis(to_vis)
                vis_dir = join(
                    train_vis_epoch_dir.format(e=step),
                    "batch%09d" % batch_i)
                raw_f = (join(
                    train_vis_epoch_dir.format(e=step),
                    "batch%09d_raw.pickle" % batch_i)
                    if dump_raw else None)
                model.vis_batch(
                    to_vis, vis_dir, mode="train", dump_raw_to=raw_f)
                vis_dirs.append(vis_dir)
            if vis_dirs:
                comp_f = join(train_vis_epoch_dir.format(e=step), "all")
                view_at = model.compile_batch_vis(
                    vis_dirs, comp_f, mode="train")
                if view_at is not None:
                    writer_train.text("vis_train", view_at, step)
                maintain_epoch_queue(
                    train_deque, train_vis_epoch_dir.format(e=step))

        # ---- validation ----
        if vali_batches and vali_period > 0 and step % vali_period == 0:
            # ALL processes run the eval computation (a multi-host XLA
            # program hangs if any participant skips it); only host 0
            # materializes vis and writes scalars below.
            is_host0 = jax.process_index() == 0
            v_loss, v_vis, v_psnr = [], [], []
            for batch in vali_batches:
                # A SIGTERM during validation is acted on HERE (this
                # epoch's training is complete, so the save lands at
                # `step`), not an epoch later. All processes agree at
                # the same vali batch index.
                if preempt_agreed():
                    if manager.latest_step() != step:
                        saved = manager.save(step, state, force=True)
                    else:  # the ckpt block above already saved it
                        saved = ckptdir
                    manager.wait()
                    manager.close()
                    shutdown_place_pool()
                    logger.warn(
                        "Preempted during validation at epoch %d; "
                        "checkpointed to\n\t%s", step, saved)
                    return outdir
                arrays, meta = strip_host_fields(batch)
                if is_multiprocess:
                    # Every host iterated the SAME unsharded vali set.
                    arrays = mesh_mod.make_global_batch(
                        mesh, arrays, tile_spatial, replicate=True)
                elif device_cache is not None:
                    arrays = device_cache.shard_batch(
                        mesh, arrays, batch["id"], tile_spatial)
                else:
                    arrays = mesh_mod.shard_batch(
                        mesh, arrays, tile_spatial)
                loss, to_vis = eval_step(state, arrays)
                if not is_host0:
                    continue
                # Deferred like the train losses (batched fetch below):
                # a float() here would serialize every vali batch on a
                # tunnel round trip. Vis is staged (async copy) so the
                # transfer overlaps the remaining eval batches.
                v_loss.append(loss)
                v_vis.append(stage_vis(to_vis, meta))
            if is_host0:  # computation done everywhere; host 0 writes
                v_loss = [float(x) for x in jax.device_get(v_loss)]
                v_vis = [materialize_vis(s) for s in v_vis]
                # Quantitative vali PSNR per epoch (the reference only
                # writes PSNR into per-image vis metadata; a scalar
                # series enables early checkpoint selection).
                for to_vis in v_vis:
                    if "gt_camspc" in to_vis and hasattr(model, "psnr"):
                        gt01 = imgutil.vis_to_float01(
                            to_vis["gt_camspc"])
                        pd01 = imgutil.vis_to_float01(
                            to_vis["pred_camspc"])
                        ids = to_vis.get("id") or [None] * pd01.shape[0]
                        for i in range(pd01.shape[0]):
                            v_psnr.append(
                                (ids[i], model.psnr(gt01[i], pd01[i])))
                writer_vali.scalar(
                    "loss_vali", float(np.mean(v_loss)), step)
                if v_psnr:
                    finite = [(i, p) for i, p in v_psnr
                              if np.isfinite(p)]
                    if finite:
                        vals = [p for _, p in finite]
                        # Mean AND std over the holdout set: a single
                        # held-out config gives a point estimate only;
                        # multi-config holdouts (holdout_cam/light
                        # lists) make the quality numbers statistical.
                        writer_vali.scalar(
                            "psnr_vali", float(np.mean(vals)), step)
                        if len(vals) > 1:
                            writer_vali.scalar(
                                "psnr_vali_std",
                                float(np.std(vals, ddof=1)), step)
                            writer_vali.scalar(
                                "psnr_vali_n", len(vals), step)
                        if any(i for i, _ in finite):
                            writer_vali.text(
                                "psnr_vali_by_id", json.dumps(
                                    {str(i): round(float(p), 4)
                                     for i, p in finite}), step)
                            # Multi-scene runs: per-scene means (ids
                            # are namespaced '<scene>/<id>').
                            by_scene = {}
                            for i, p in finite:
                                if i and "/" in str(i):
                                    by_scene.setdefault(
                                        str(i).rsplit("/", 1)[0],
                                        []).append(p)
                            if len(by_scene) > 1:
                                for scene, ps in sorted(
                                        by_scene.items()):
                                    writer_vali.scalar(
                                        "psnr_vali/%s" % scene,
                                        float(np.mean(ps)), step)
                vis_dirs = []
                for batch_i, to_vis in enumerate(v_vis):
                    vis_dir = join(
                        vali_vis_epoch_dir.format(e=step),
                        "batch%09d" % batch_i)
                    model.vis_batch(to_vis, vis_dir, mode="vali")
                    vis_dirs.append(vis_dir)
                comp_f = join(vali_vis_epoch_dir.format(e=step), "all")
                view_at = model.compile_batch_vis(
                    vis_dirs, comp_f, mode="vali")
                if view_at is not None:
                    writer_vali.text("vis_vali", view_at, step)
                maintain_epoch_queue(
                    vali_deque, vali_vis_epoch_dir.format(e=step))

        # Keep-best retention: prune once this epoch's scalars are on
        # disk (the step-N save happens BEFORE step N's vali psnr
        # exists, so retention must re-evaluate here, not at save).
        # Only on ckpt epochs — the retained set can only change at a
        # save, and on pod slices prune costs a broadcast (vali-only
        # epochs must stay collective-free for the preemption tests'
        # timing contract).
        if step % ckpt_period == 0:
            manager.prune()

        if device_cache is not None and step == epoch_restored + 1:
            st = device_cache.stats()
            logger.info(
                "Device example cache after epoch 1: %d examples, "
                "%.0f MB (hits %d / misses %d)", st["examples"],
                st["mb"], st["hits"], st["misses"])
        logger.info(
            "Epoch %d/%d  loss %.6f  (%.3f s/batch)", step, epochs,
            float(np.mean(batch_loss)), float(np.mean(batch_time)))

        # Epoch boundary: a SIGTERM in the epoch tail (vis writing,
        # summaries) exits here instead of after the next epoch's
        # first preempt_sync batches. The epoch is complete, so the
        # save lands at `step` — unless the ckpt block above already
        # saved this step.
        if epoch_i + 1 < epochs and preempt_agreed():
            if manager.latest_step() != step:
                saved = manager.save(step, state, force=True)
            else:
                saved = "(already checkpointed at step %d)" % step
            manager.wait()
            manager.close()
            shutdown_place_pool()
            logger.warn(
                "Preempted at the end of epoch %d; %s", step, saved)
            return outdir

    manager.wait()
    manager.close()
    shutdown_place_pool()
    logger.info("Training done: %d epochs", epochs)
    return outdir


if __name__ == "__main__":
    main()
