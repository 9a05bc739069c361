"""NLT inference driver: averaged-observation relighting/view synthesis.

Re-design of the reference's test pipeline (reference: nlt/nlt_test.py):

    python -m nlt_tpu.nlt_test --ckpt=<outdir>/checkpoints
        [--step=N] [--batch_size_override=N] [--n_obs_batches=N] [--fps=N]

1. the config .ini is reconstructed from the checkpoint path convention
   (<outdir>.ini next to <outdir>/checkpoints; reference: :47-48);
2. a fixed observation feature pyramid is computed by running training
   batches' (rgb - base) through the obs path and averaging every
   level's features over all samples (reference: extract_feat, :97-127);
3. test inference runs with that pyramid tiled to the batch as
   obs_override (reference: infer, :78-94);
4. per-batch visualizations are compiled into a video (reference:
   :149-157).
"""

import argparse
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from . import datasets as datasets_mod
from . import models as models_mod
from .parallel import train as train_mod
from .utils import checkpoint as ckpt_mod
from .utils import config as config_mod
from .utils import img as imgutil
from .utils import logging as logutil

logger = logutil.Logger(loggee="nlt_test")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True,
                   help="path to <outdir>/checkpoints (directory)")
    p.add_argument("--step", type=str, default=None,
                   help="checkpoint step; an integer, or 'best' to "
                        "select the epoch with the best logged "
                        "psnr_vali; default latest")
    p.add_argument("--batch_size_override", type=int, default=None)
    p.add_argument("--n_obs_batches", type=int, default=1)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--device", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"])
    p.add_argument("--n_data", type=int, default=-1,
                   help="devices along the inference data axis: -1 = "
                        "all available (clamped to the batch size), "
                        "1 = single-device (the reference's single-"
                        "replica test path, nlt/nlt_test.py:78-94)")
    # Multi-host inference (one process per host on a pod slice): the
    # same jax.distributed bring-up as training. Each process feeds its
    # devices' slice of every test batch; outputs are all-gathered to
    # replicated inside the jitted program, and host 0 writes frames —
    # byte-identical to the single-process run.
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args(argv)


def get_config_ini(ckpt_dir):
    """<outdir>/checkpoints -> <outdir>.ini (reference: :47-48)."""
    outdir = ckpt_dir.rstrip("/").rsplit("/", 1)[0]
    return outdir + ".ini"


def restore_model(config, ckpt_dir, step=None):
    ModelCls = models_mod.get_model_class(config.get("model"))
    model = ModelCls(config)
    tx = train_mod.make_optimizer(config.get_float("lr"),
                              config.get_float("mgm", -1))
    state = train_mod.init_state(
        model, tx, jax.random.PRNGKey(0),
        ema_decay=config.get_float("ema_decay", 0.0))
    manager = ckpt_mod.CheckpointManager(ckpt_dir)
    state, restored = manager.restore(state, step=step)
    if restored == 0:
        logger.warn("No checkpoint found under %s; using fresh init",
                    ckpt_dir)
    manager.close()
    # Inference prefers the EMA weights when the run kept them.
    state = dict(state, params=train_mod.ema_params_of(state))
    return model, state


def extract_feat(model, state, dataset, n_obs_batches=1):
    """Average observation feature pyramid over training batches
    (reference: nlt_test.py:97-127)."""
    from .models.nlt import normalize_batch

    feat_sums, count = None, 0
    for batch_i, batch in enumerate(
            dataset.iterate(seed=0, drop_remainder=False)):
        if 0 <= n_obs_batches <= batch_i:
            break
        batch = normalize_batch(
            {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)})
        x = batch["rgb"] - batch["base"]
        feats = model.extract_obs_features(state["params"]["net"], x)
        if feat_sums is None:
            feat_sums = [jnp.sum(f, axis=0, keepdims=True) for f in feats]
        else:
            feat_sums = [
                s + jnp.sum(f, axis=0, keepdims=True)
                for s, f in zip(feat_sums, feats)]
        count += x.shape[0]
    assert feat_sums is not None, "No observation batches"
    return [s / count for s in feat_sums]  # each 1 x H x W x C


def infer(model, state, dataset, feat_agg, outroot, report_every=10,
          mesh=None):
    """Run test inference with the tiled averaged pyramid as obs_override
    (reference: nlt_test.py:78-94).

    mesh: optional ('data', 'tile') mesh — test batches shard over
    'data' (remainder batches replicate) and the obs pyramid + params
    replicate, so a pod slice accelerates test sweeps the same way it
    does training (the reference is single-replica at test time;
    extension per VERDICT r2 #5). Frames are identical to the
    single-device path — sharding is a layout, not a math change."""
    batch_dirs = []
    is_linear = model.config.get_bool("linear_space")
    is_mp = jax.process_count() > 1
    if mesh is not None:
        from .parallel import mesh as mesh_mod
        state = mesh_mod.replicate_tree(mesh, state)

    def _apply(p, b, ov):
        tv = model.apply(p, b, "test", obs_override=ov)[3]
        tv.pop("pred", None)  # UV-space, unused by test vis
        # Pack on device: the fetch is the per-batch bottleneck on
        # thin-host deployments (utils/img.pack_vis).
        return imgutil.pack_vis(tv, linear_space=is_linear)

    if mesh is not None and is_mp:
        # Pod-slice inference: the compute runs data-sharded; the
        # (packed, small) vis outputs are all-gathered to replicated
        # INSIDE the program so host 0 can write every frame —
        # byte-identical to the single-process run.
        from .parallel import mesh as mesh_mod
        apply_jit = jax.jit(
            _apply, out_shardings=mesh_mod.replicated(mesh))
    else:
        apply_jit = jax.jit(_apply)

    # The tiled obs pyramid is loop-invariant per batch size; build it
    # once per distinct bs (a per-batch replicate_tree would pay a
    # device->host->device round trip per level per batch — seconds on
    # tunneled deployments).
    feat_host = jax.device_get(list(feat_agg))
    override_cache = {}

    def get_override(bs):
        ov = override_cache.get(bs)
        if ov is None:
            if mesh is not None:
                from .parallel import mesh as mesh_mod
                ov = mesh_mod.replicate_tree(
                    mesh, [np.tile(x, (bs, 1, 1, 1))
                           for x in feat_host])
            else:
                ov = [jnp.tile(jnp.asarray(x), (bs, 1, 1, 1))
                      for x in feat_host]
            override_cache[bs] = ov
        return ov

    # One-deep vis pipeline: batch i's packed outputs start their
    # device->host copy (copy_to_host_async) right after dispatch and
    # are materialized+written while batch i+1 computes — the fetch
    # no longer serializes with inference on tunneled hosts.
    pending = []

    def write_oldest():
        staged, out_d, ids, nn_ids = pending.pop(0)
        staged = jax.device_get(staged)
        staged["id"] = ids
        staged["nn_id"] = nn_ids
        model.vis_batch(staged, out_d, "test")

    # Keep the remainder: every test view must be inferred.
    for batch_i, batch in enumerate(
            dataset.iterate(seed=0, drop_remainder=False)):
        arrays = {k: v for k, v in batch.items()
                  if not isinstance(v, list)}
        bs = arrays["base"].shape[0]
        if mesh is not None:
            from .parallel import mesh as mesh_mod
            if is_mp:
                # Every host iterated the same (deterministic) test
                # set; each contributes its devices' slice of the
                # batch. Remainder batches replicate (exact, no
                # padding bookkeeping), like shard_batch's remainder
                # path.
                if bs % mesh.shape["data"] == 0:
                    shard_id, num_shards = mesh_mod.process_data_shard(
                        mesh)
                    per = bs // num_shards
                    local = {
                        k: v[shard_id * per:(shard_id + 1) * per]
                        for k, v in arrays.items()}
                    arrays = mesh_mod.make_global_batch(mesh, local)
                else:
                    arrays = mesh_mod.make_global_batch(
                        mesh, arrays, replicate=True)
            else:
                arrays = mesh_mod.shard_batch(mesh, arrays)
            obs_override = get_override(bs)
        else:
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            obs_override = get_override(bs)
        to_vis = apply_jit(state["params"], arrays, obs_override)
        outdir = join(outroot, "batch%09d" % batch_i)
        if not is_mp or jax.process_index() == 0:
            to_vis = dict(to_vis)
            for v in to_vis.values():
                try:
                    v.copy_to_host_async()
                except Exception:
                    pass  # backend without async staging
            pending.append((to_vis, outdir, batch["id"],
                            batch["nn_id"]))
            if len(pending) > 1:
                write_oldest()
        batch_dirs.append(outdir)
        if (batch_i + 1) % report_every == 0:
            logger.info("Done inferring %d batches", batch_i + 1)
    while pending:
        write_oldest()
    if is_mp:
        # Host 0 may still be writing; everyone leaves infer() together
        # (the caller's video compilation reads these files).
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("nlt_tpu:infer_done")
    return batch_dirs


def main(argv=None):
    args = parse_args(argv)
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from .parallel import mesh as mesh_mod
    mesh_mod.initialize_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id)

    config_ini = get_config_ini(args.ckpt)
    config = config_mod.read_config(config_ini)
    if args.batch_size_override is not None:
        config.set("bs", args.batch_size_override)

    # 'best' selects the epoch with the best logged psnr_vali among
    # the checkpoints retention kept; numeric strings become ints.
    args.step = ckpt_mod.resolve_step(args.ckpt, args.step)
    model, state = restore_model(config, args.ckpt, step=args.step)

    Dataset = datasets_mod.get_dataset_class(config.get("dataset"))
    dataset_train = Dataset(config, "train")
    dataset_test = Dataset(config, "test")

    feat_agg = extract_feat(
        model, state, dataset_train, n_obs_batches=args.n_obs_batches)

    # Data-sharded inference over the available devices (clamped to the
    # largest batch-size divisor; single-device when only one chip or
    # --n_data 1).
    mesh = None
    if args.n_data != 1 and len(jax.devices()) > 1:
        from .parallel import mesh as mesh_mod
        bs = config.get_int("bs")
        n_data = None
        if args.n_data > 0:
            # An explicit non-divisor would silently replicate every
            # batch (shard_batch's remainder path) — N-fold redundant
            # compute with zero speedup. Clamp to the largest divisor
            # of bs that fits the devices instead, loudly.
            n_data = min(args.n_data, len(jax.devices()))
            while n_data > 1 and bs % n_data != 0:
                n_data -= 1
            if n_data != args.n_data:
                logger.warn(
                    "--n_data %d does not divide bs %d (or exceeds "
                    "the %d devices); using %d", args.n_data, bs,
                    len(jax.devices()), n_data)
        mesh = mesh_mod.make_mesh(n_data=n_data, batch_size=bs)
        logger.info("Inference mesh: %s over %d devices",
                    dict(mesh.shape), len(jax.devices()))

    step = args.step if args.step is not None else "latest"
    outroot = join(config_ini[:-len(".ini")], "vis_test",
                   "ckpt-%s_pred" % step)
    batch_vis_dirs = infer(
        model, state, dataset_test, feat_agg, outroot, mesh=mesh)

    if jax.process_count() > 1 and jax.process_index() != 0:
        return None  # frames + video are host 0's

    # Use infer()'s dir list, not a re-glob (stale dirs from a previous
    # run with a different batch size would pollute the video).
    view_at = model.compile_batch_vis(
        batch_vis_dirs, outroot.rstrip("/"), "test", fps=args.fps)
    logger.info("Compilation available for viewing at\n\t%s", view_at)
    return view_at


if __name__ == "__main__":
    main()
