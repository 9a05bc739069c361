"""End-to-end driver tests: trainvali on a synthetic scene (checkpoints,
scalars, vis, resume) and the nlt_test inference pipeline
(reference flows: nlt/trainvali.py:48-251, nlt/nlt_test.py:130-158)."""

import json
import os
import subprocess
import sys
from glob import glob
from os.path import join

import jax
import numpy as np
import pytest

from nlt_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene") / "sphere")
    subprocess.run(
        [sys.executable, join(REPO, "data_gen", "synthesize.py"),
         "--outroot", root, "--n_cams", "3", "--n_lights", "3",
         "--n_test", "2", "--imh", "32", "--uvs", "32"],
        check=True, capture_output=True)
    return root


def write_ini(tmp_path, scene_root, **overrides):
    cfg = {
        "dataset": "nlt", "model": "nlt", "loss": "l1",
        "no_batch": False,
        "imh": 32, "imw": 32, "uvh": 32, "uvw": 32,
        "use_obs": True, "skip_connect_base": True,
        "linear_space": False,
        "depth0": 16, "depth": 16, "kernel": 2, "stride": 2,
        "norm": "None", "act": "leakyrelu", "pool": "None",
        "bs": 2, "cache": True,
        "data_root": scene_root,
        "holdout_cam": "C02", "holdout_light": "L002",
        "lr": "1e-3", "mgm": -1, "epochs": 2,
        "ckpt_period": 1, "vali_period": 1, "vis_train_batches": 1,
        "vali_batches": 1, "keep_recent_epochs": 2,
        "overwrite": True,
        "outroot": str(tmp_path / "out"),
        "xname": "sphere_lr:{lr}_depth:{depth}",
    }
    cfg.update(overrides)
    c = Config(cfg)
    ini = str(tmp_path / "exp.ini")
    c.save(ini)
    return ini


@pytest.fixture(scope="module")
def trained(tmp_path_factory, scene_root):
    """Train 2 epochs once; several tests inspect the artifacts."""
    from nlt_tpu import trainvali
    tmp_path = tmp_path_factory.mktemp("train")
    ini = write_ini(tmp_path, scene_root)
    outdir = trainvali.main(["--config", ini])
    return tmp_path, ini, outdir


def test_outdir_artifacts(trained):
    _, _, outdir = trained
    assert os.path.isdir(join(outdir, "checkpoints"))
    assert os.path.exists(outdir.rstrip("/") + ".ini")
    scalars = join(outdir, "summary_train", "scalars.jsonl")
    assert os.path.exists(scalars)
    tags = [json.loads(line)["tag"] for line in open(scalars)]
    assert "loss_train" in tags and "batch_time_train" in tags
    assert "texels_per_sec" in tags
    vali_scalars = join(outdir, "summary_vali", "scalars.jsonl")
    assert os.path.exists(vali_scalars)
    vtags = [json.loads(line)["tag"] for line in open(vali_scalars)]
    assert "loss_vali" in vtags and "psnr_vali" in vtags


def test_vis_artifacts(trained):
    _, _, outdir = trained
    htmls = glob(join(outdir, "vis_train", "epoch*", "all.html"))
    assert htmls, "No train vis HTML"
    pngs = glob(join(outdir, "vis_train", "epoch*", "batch*", "*_pred.png"))
    assert pngs
    vali_htmls = glob(join(outdir, "vis_vali", "epoch*", "all.html"))
    assert vali_htmls


def test_loss_decreases(trained):
    _, _, outdir = trained
    scalars = join(outdir, "summary_train", "scalars.jsonl")
    losses = [json.loads(line) for line in open(scalars)]
    losses = [x["value"] for x in losses if x["tag"] == "loss_train"]
    assert len(losses) == 2
    assert losses[-1] < losses[0], losses


def test_checkpoints_saved(trained):
    _, _, outdir = trained
    from nlt_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(join(outdir, "checkpoints"))
    assert mgr.latest_step() == 2
    mgr.close()


def test_resume_continues(trained, scene_root):
    """Re-running with more epochs resumes from the checkpoint instead of
    restarting (reference: restore-on-startup, trainvali.py:138-141,
    168-169)."""
    from nlt_tpu import trainvali
    tmp_path, ini, outdir = trained
    cfg = Config.from_ini(ini)
    cfg.set("epochs", 3)
    cfg.set("overwrite", False)  # keep the previous outdir
    ini2 = str(tmp_path / "exp_resume.ini")
    cfg.save(ini2)
    outdir2 = trainvali.main(["--config", ini2])
    assert outdir2 == outdir
    from nlt_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(join(outdir, "checkpoints"))
    assert mgr.latest_step() == 3
    # keep_recent_epochs=2 retention
    assert len(mgr.all_steps()) <= 2
    mgr.close()


def test_nlt_test_inference(trained):
    """Full inference: restore, averaged obs features, obs_override,
    video compilation."""
    from nlt_tpu import nlt_test
    _, ini, outdir = trained
    view_at = nlt_test.main([
        "--ckpt", join(outdir, "checkpoints"),
        "--n_obs_batches", "1", "--fps", "4"])
    assert os.path.exists(view_at)
    pred_pngs = glob(join(
        ini[:-len(".ini")] if False else outdir, "vis_test", "*",
        "batch*", "*_pred.png"))
    assert pred_pngs
    meta = glob(join(outdir, "vis_test", "*", "batch*", "*_metadata.json"))
    assert meta
    md = json.load(open(meta[0]))
    assert md["id"].startswith("test_")


def test_best_step_selection(tmp_path, trained):
    """--step=best picks the retained checkpoint with the best logged
    psnr_vali; evicted-global-best and no-series cases degrade sanely."""
    from nlt_tpu.utils import checkpoint as ckpt_mod

    outdir = tmp_path / "xp"
    (outdir / "summary_vali").mkdir(parents=True)
    ckpt_dir = outdir / "checkpoints"
    ckpt_dir.mkdir()
    with open(outdir / "summary_vali" / "scalars.jsonl", "w") as h:
        for step, v in [(1, 20.0), (2, 25.0), (3, 23.0),
                        (4, float("nan")), (5, 24.0)]:
            h.write(json.dumps(
                {"tag": "psnr_vali", "value": v, "step": step}) + "\n")
        h.write(json.dumps(
            {"tag": "loss_vali", "value": -1.0, "step": 5}) + "\n")
    assert ckpt_mod.best_step(str(ckpt_dir), [1, 2, 3, 4, 5]) == (2, 25.0)
    # Retention evicted the global best: best REMAINING wins (warned).
    assert ckpt_mod.best_step(str(ckpt_dir), [3, 4, 5]) == (5, 24.0)
    assert ckpt_mod.best_step(str(ckpt_dir), []) is None
    # resolve_step passthroughs + no-series fallback.
    assert ckpt_mod.resolve_step(str(ckpt_dir), None) is None
    assert ckpt_mod.resolve_step(str(ckpt_dir), "latest") is None
    assert ckpt_mod.resolve_step(str(ckpt_dir), "7") == 7
    assert ckpt_mod.resolve_step(str(ckpt_dir), 7) == 7
    assert ckpt_mod.resolve_step(str(ckpt_dir), "best") is None  # no ckpts
    with pytest.raises(ValueError, match="'best', or 'latest'"):
        ckpt_mod.resolve_step(str(ckpt_dir), "bset")

    # Relative --ckpt with no path separator (run from inside the
    # outdir) must still find ../summary_vali.
    cwd = os.getcwd()
    try:
        os.chdir(outdir)
        assert ckpt_mod.best_step("checkpoints", [1, 2, 3, 4, 5]) == (
            2, 25.0)
    finally:
        os.chdir(cwd)

    # End to end on a real trained outdir: 'best' resolves to a step
    # the manager can restore.
    _, _, trained_outdir = trained
    tck = join(trained_outdir, "checkpoints")
    mgr = ckpt_mod.CheckpointManager(tck)
    steps = mgr.all_steps()
    mgr.close()
    picked = ckpt_mod.resolve_step(tck, "best")
    assert picked in steps


def test_keep_best_retention_long_run(tmp_path):
    """250-epoch-shaped retention: psnr_vali peaks at epoch 7 then
    drifts down (the measured small-scene overfit shape, RESULTS.md);
    with keep_recent_epochs=3 the global-best step must survive every
    prune and restore bit-exactly (VERDICT r4 weak #3: recency-only
    retention degraded --step=best exactly on long runs)."""
    from nlt_tpu.utils import checkpoint as ckpt_mod

    outdir = tmp_path / "run"
    ckpt_dir = outdir / "checkpoints"
    (outdir / "summary_vali").mkdir(parents=True)
    scal = outdir / "summary_vali" / "scalars.jsonl"
    mgr = ckpt_mod.CheckpointManager(
        str(ckpt_dir), max_to_keep=3, keep_best_metric="psnr_vali")
    n = 25
    psnr = [20.0 + 10.0 * np.exp(-abs(s - 7) / 6.0)
            for s in range(1, n + 1)]
    best_state = None
    for s in range(1, n + 1):
        state = {"params": {"w": np.full((4,), float(s))},
                 "step": np.asarray(s, np.int64)}
        mgr.save(s, state)
        mgr.wait()
        # Driver cadence: the step-s save lands BEFORE step s's vali
        # scalar exists; prune runs after the scalar write.
        with open(scal, "a") as h:
            h.write(json.dumps({"tag": "psnr_vali",
                                "value": psnr[s - 1],
                                "step": s}) + "\n")
        mgr.prune()
        if s == 7:
            best_state = state
    steps = sorted(int(x) for x in mgr.all_steps())
    assert steps == [7, 23, 24, 25], steps
    assert ckpt_mod.resolve_step(str(ckpt_dir), "best") == 7
    restored, rs = mgr.restore(
        {"params": {"w": np.zeros((4,))}, "step": np.asarray(0, np.int64)}, step=7)
    mgr.close()
    assert rs == 7
    np.testing.assert_array_equal(
        restored["params"]["w"], best_state["params"]["w"])
    assert int(restored["step"]) == 7
    # keep_best off: plain recency window (reference semantics).
    mgr2 = ckpt_mod.CheckpointManager(str(ckpt_dir), max_to_keep=3)
    assert sorted(int(x) for x in mgr2.all_steps()) == [7, 23, 24, 25]
    mgr2.close()


def test_trainvali_keep_best_wiring(tmp_path, scene_root):
    """End to end: the driver's retention keeps the global-best
    psnr_vali epoch alongside the keep_recent_epochs=1 window."""
    from nlt_tpu import trainvali
    from nlt_tpu.utils import checkpoint as ckpt_mod

    ini = write_ini(tmp_path, scene_root, epochs=6,
                    keep_recent_epochs=1, xname="keepbest")
    outdir = trainvali.main(["--config", ini])
    ckpt_dir = join(outdir, "checkpoints")
    mgr = ckpt_mod.CheckpointManager(ckpt_dir)
    steps = sorted(int(s) for s in mgr.all_steps())
    mgr.close()
    assert steps[-1] == 6
    assert len(steps) <= 2  # {global best} U {latest}
    # The GLOBAL best over every logged epoch is retained, not merely
    # the best remaining.
    glob_best = ckpt_mod.best_step(ckpt_dir, list(range(1, 7)))
    assert glob_best is not None and glob_best[0] in steps
    assert ckpt_mod.resolve_step(ckpt_dir, "best") == glob_best[0]


def test_resume_preserves_vis_retention(tmp_path, scene_root):
    """keep_recent_epochs retention survives a resume: the vis queues
    are seeded from the dirs on disk, so a restart must not wipe the
    previous run segment's retained epochs."""
    from nlt_tpu import trainvali
    ini = write_ini(tmp_path, scene_root, epochs=2, keep_recent_epochs=3,
                    xname="retain")
    outdir = trainvali.main(["--config", ini])
    before = set(os.listdir(join(outdir, "vis_train")))
    assert len(before) == 2  # epochs 1-2 retained (keep=3)

    cfg = Config.from_ini(ini)
    cfg.set("epochs", 3)
    cfg.set("overwrite", False)
    ini2 = str(tmp_path / "exp_retain_resume.ini")
    cfg.save(ini2)
    trainvali.main(["--config", ini2])
    after = sorted(os.listdir(join(outdir, "vis_train")))
    # 3 epochs exist and fit keep_recent_epochs=3: nothing was evicted.
    assert after == ["epoch%09d" % e for e in (1, 2, 3)]


def test_trainvali_multi_observation(tmp_path, scene_root):
    """Full driver run with n_obs=2: stacked neighbor fields flow
    through the pipeline, blob cache, jitted steps, and vis."""
    from nlt_tpu import trainvali
    ini = write_ini(tmp_path, scene_root, epochs=1, n_obs=2,
                    xname="nobs2")
    outdir = trainvali.main(["--config", ini])
    metas = glob(join(outdir, "vis_train", "epoch*", "batch*",
                      "*_metadata.json"))
    assert metas
    meta = json.load(open(metas[0]))
    assert len(meta["nn_id"].split(";")) == 2


def test_debug_flag_truncates(tmp_path, scene_root):
    from nlt_tpu import trainvali
    ini = write_ini(tmp_path, scene_root, epochs=1,
                    xname="debugrun_{lr}")
    outdir = trainvali.main(["--config", ini, "--debug"])
    scalars = join(outdir, "summary_train", "scalars.jsonl")
    recs = [json.loads(line) for line in open(scalars)]
    assert any(r["tag"] == "loss_train" for r in recs)


def test_cli_overrides(tmp_path, scene_root, capsys):
    """--set overrides config keys before xname expansion and the
    outdir snapshot records the EFFECTIVE config (the ckpt->ini
    contract nlt_test/serve restore from)."""
    from nlt_tpu import trainvali
    from nlt_tpu.utils import config as config_mod
    ini = write_ini(tmp_path, scene_root, xname="ov_lr:{lr}")
    outdir = trainvali.main([
        "--config", ini, "--debug",
        "--set", "lr=5e-4", "--set", "epochs=1"])
    assert outdir.endswith("ov_lr:5e-4")  # xname saw the override
    snap = config_mod.read_config(outdir.rstrip("/") + ".ini")
    assert snap.get("lr") == "5e-4"
    assert snap.get_int("epochs") == 1

    # Resume WITHOUT repeating --set: edit-and-continue semantics —
    # the new command's config wins (the reference's resume workflow
    # re-reads the ini), but the drift from the recorded snapshot is
    # warned LOUDLY and the snapshot is updated to the new effective
    # config, never left stale.
    ini2 = write_ini(tmp_path, scene_root, xname="ovresume",
                     overwrite=False)
    out2 = trainvali.main([
        "--config", ini2, "--debug", "--set", "lr=5e-4"])
    snap2_f = out2.rstrip("/") + ".ini"
    assert config_mod.read_config(snap2_f).get("lr") == "5e-4"
    capsys.readouterr()
    out2b = trainvali.main(["--config", ini2, "--debug"])
    assert out2b == out2
    logged = capsys.readouterr().out
    assert "DIFFERENT config" in logged and "lr" in logged
    assert config_mod.read_config(snap2_f).get("lr") == "1e-3"
    # Resuming with the override repeated: no drift, no warning.
    capsys.readouterr()
    trainvali.main(["--config", ini2, "--debug", "--set", "lr=1e-3"])
    assert "DIFFERENT config" not in capsys.readouterr().out


def test_serve(trained):
    """Serving path: restore, precompute obs features, warm predict."""
    from nlt_tpu.serve import Server
    _, _, outdir = trained
    server = Server(join(outdir, "checkpoints"))
    server.precompute_obs(n_obs_batches=1)
    from nlt_tpu.datasets import get_dataset_class
    Dataset = get_dataset_class(server.config.get("dataset"))
    ds = get_dataset_class("nlt")(server.config, "test")
    batch = next(iter(ds.iterate(seed=0)))
    out = server.predict(batch)
    assert out["pred_camspc"].shape[1:] == (32, 32, 3)
    assert np.all(np.isfinite(out["pred_camspc"]))
    stats = server.benchmark(batch, n=3)
    assert stats["fps"] > 0

    # Repeat-query path: the device input cache must be invisible to
    # the prediction, and repeat requests must be all-hits.
    out_c1 = server.predict(batch, ids=batch["id"])
    out_c2 = server.predict(batch, ids=batch["id"])
    np.testing.assert_array_equal(out_c1["pred_camspc"],
                                  out["pred_camspc"])
    np.testing.assert_array_equal(out_c2["pred_camspc"],
                                  out["pred_camspc"])
    assert server._input_cache.hits == len(batch["id"])

    # Device-side prediction packing for thin-host deployments.
    packed = Server(join(outdir, "checkpoints"), pack="uint8")
    packed.precompute_obs(n_obs_batches=1)
    out8 = packed.predict(batch)
    assert out8["pred_camspc"].dtype == np.uint8
    np.testing.assert_allclose(
        out8["pred_camspc"].astype(np.float32) / 255.0,
        np.clip(out["pred_camspc"], 0, 1), atol=1 / 255.0 + 1e-6)

    # Output-field subset: camera-space-only responses halve the
    # fetch bytes; values identical to the full server's.
    camonly = Server(join(outdir, "checkpoints"),
                     fields=["pred_camspc"])
    camonly.precompute_obs(n_obs_batches=1)
    outc = camonly.predict(batch)
    assert set(outc) == {"pred_camspc"}
    np.testing.assert_array_equal(outc["pred_camspc"],
                                  out["pred_camspc"])


def test_prefetch_losses_identical(tmp_path, scene_root):
    """The depth-1 placement prefetch (upload batch i+1 while batch i
    computes; VERDICT r2 #4) must not change anything numerically:
    losses equal the synchronous path bit-for-bit."""
    from nlt_tpu import trainvali
    losses = {}
    for tag, depth in (("sync", 0), ("prefetch", 1)):
        d = tmp_path / tag
        d.mkdir()
        ini = write_ini(d, scene_root, prefetch_batches=depth,
                        vali_period=-1, vis_train_batches=0,
                        vali_batches=0)
        outdir = trainvali.main(["--config", ini])
        scalars = join(outdir, "summary_train", "scalars.jsonl")
        losses[tag] = [json.loads(l)["value"] for l in open(scalars)
                       if json.loads(l)["tag"] == "loss_train"]
    assert losses["sync"] == losses["prefetch"], losses


def test_nlt_test_sharded_matches_single_device(trained):
    """Data-sharded inference over the 8-device CPU mesh produces
    byte-identical frames to the single-device path (VERDICT r2 #5:
    mesh-sharded inference; the reference is single-replica at test
    time, nlt/nlt_test.py:78-94)."""
    from nlt_tpu import nlt_test
    _, _, outdir = trained

    def run(n_data):
        nlt_test.main([
            "--ckpt", join(outdir, "checkpoints"),
            "--n_obs_batches", "1", "--fps", "4",
            "--n_data", str(n_data)])
        pngs = sorted(glob(join(
            outdir, "vis_test", "*", "batch*", "*_pred.png")))
        assert pngs
        return {p: open(p, "rb").read() for p in pngs}

    single = run(1)
    sharded = run(-1)  # all devices, clamped to the batch size
    assert set(single) == set(sharded)
    for p in single:
        assert single[p] == sharded[p], "frame differs: %s" % p


def test_serve_sharded_matches_unsharded(trained):
    """Server(shard=True) shards request batches over the device mesh
    with identical predictions, for both streamed and repeat-query
    (device input cache) requests."""
    from nlt_tpu.serve import Server
    from nlt_tpu.datasets import get_dataset_class
    _, _, outdir = trained
    ref = Server(join(outdir, "checkpoints"))
    ref.precompute_obs(n_obs_batches=1)
    sh = Server(join(outdir, "checkpoints"), shard=True)
    sh.precompute_obs(n_obs_batches=1)

    ds = get_dataset_class("nlt")(sh.config, "test")
    batch = next(iter(ds.iterate(seed=0)))
    want = ref.predict(batch)

    got = sh.predict(batch)
    np.testing.assert_allclose(
        got["pred_camspc"], want["pred_camspc"], rtol=1e-6, atol=1e-6)
    # The inputs really were sharded over a >1-device data axis.
    assert sh._meshes and all(
        m.shape["data"] > 1 for m in sh._meshes.values())

    # Repeat-query path through the device cache, sharded.
    got_c1 = sh.predict(batch, ids=batch["id"])
    got_c2 = sh.predict(batch, ids=batch["id"])
    np.testing.assert_allclose(
        got_c1["pred_camspc"], want["pred_camspc"], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        got_c2["pred_camspc"], got_c1["pred_camspc"])
    assert sh._input_cache.hits == len(batch["id"])

    stats = sh.benchmark(batch, n=3, ids=batch["id"])
    assert stats["fps"] > 0

    # Tile-sharded serving: each request's image ROWS split over a
    # (1, n_devices) mesh — the bs-1 latency lever. Predictions
    # identical, streamed and through the device input cache.
    tl = Server(join(outdir, "checkpoints"), shard="tile")
    tl.precompute_obs(n_obs_batches=1)
    batch1 = {k: v[:1] for k, v in batch.items()}
    want1 = ref.predict(batch1)
    got_t = tl.predict(batch1)
    np.testing.assert_allclose(
        got_t["pred_camspc"], want1["pred_camspc"],
        rtol=1e-6, atol=1e-6)
    assert tl._meshes["tile"].shape["tile"] > 1
    got_tc = tl.predict(batch1, ids=batch1["id"])
    np.testing.assert_allclose(
        got_tc["pred_camspc"], want1["pred_camspc"],
        rtol=1e-6, atol=1e-6)
    got_tc2 = tl.predict(batch1, ids=batch1["id"])
    np.testing.assert_array_equal(
        got_tc2["pred_camspc"], got_tc["pred_camspc"])
    assert tl._input_cache.hits >= 1


def test_sigterm_checkpoints_and_resumes(tmp_path, scene_root):
    """Preemption safety: SIGTERM mid-training checkpoints after the
    in-flight batch and exits 0; a rerun resumes from the saved state
    and completes (TPU pod workers are preempted with a short grace
    window — the reference has no preemption story)."""
    import signal
    import subprocess
    import time as time_mod

    ini = write_ini(tmp_path, scene_root, epochs=100000,
                    ckpt_period=10 ** 6,
                    vali_period=-1, vali_batches=0,
                    vis_train_batches=0)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    proc = subprocess.Popen(
        [sys.executable, "-m", "nlt_tpu.trainvali", "--config", ini,
         "--device", "cpu"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    outdir = join(str(tmp_path / "out"), "sphere_lr:1e-3_depth:16")
    # Wait for training to be demonstrably underway (first scalars
    # would need ckpt_period; use the summary dir mtime instead).
    t0 = time_mod.time()
    while time_mod.time() - t0 < 300:
        if os.path.isdir(join(outdir, "checkpoints")):
            time_mod.sleep(3)  # a few batches into some epoch
            break
        time_mod.sleep(0.5)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-3000:]
    assert "Preempted" in out, out[-3000:]
    assert glob(join(outdir, "checkpoints", "*")), "no checkpoint saved"

    # Resume: finish a small number of additional epochs cleanly.
    cfg = Config.from_ini(ini)
    from nlt_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(join(outdir, "checkpoints"))
    saved_step = mgr.latest_step()
    mgr.close()
    cfg.set("epochs", saved_step + 2)
    cfg.set("overwrite", False)
    ini2 = str(tmp_path / "resume.ini")
    cfg.save(ini2)
    subprocess.run(
        [sys.executable, "-m", "nlt_tpu.trainvali", "--config", ini2,
         "--device", "cpu"],
        env=env, cwd=REPO, check=True, capture_output=True, timeout=600)
    mgr = CheckpointManager(join(outdir, "checkpoints"))
    assert mgr.latest_step() >= saved_step
    mgr.close()


def test_init_from_warm_start(trained, tmp_path, scene_root):
    """init_from seeds params from another run's checkpoint — across a
    RESOLUTION change (the convnet is resolution-agnostic), with a
    fresh optimizer/epoch counter — and trains from a better start
    than a cold init."""
    from nlt_tpu import trainvali
    _, _, src_outdir = trained

    losses = {}
    for tag, extra in (
            ("cold", {}),
            ("warm", {"init_from": join(src_outdir, "checkpoints")})):
        d = tmp_path / tag
        d.mkdir()
        ini = write_ini(d, scene_root, imh=64, imw=64, uvh=64, uvw=64,
                        epochs=1, vali_period=-1, vali_batches=0,
                        vis_train_batches=0, **extra)
        outdir = trainvali.main(["--config", ini])
        scalars = join(outdir, "summary_train", "scalars.jsonl")
        losses[tag] = [json.loads(l)["value"] for l in open(scalars)
                       if json.loads(l)["tag"] == "loss_train"][0]
    assert losses["warm"] < losses["cold"], losses

    # A missing source checkpoint fails loudly.
    d = tmp_path / "bad"
    d.mkdir()
    ini = write_ini(d, scene_root, epochs=1, vali_period=-1,
                    vali_batches=0, vis_train_batches=0,
                    init_from=str(tmp_path / "nonexistent"))
    with pytest.raises(Exception):
        trainvali.main(["--config", ini])


def test_serve_export_roundtrip(trained, tmp_path):
    """Server.export writes a self-contained AOT artifact (weights +
    obs pyramid baked into the serialized StableHLO program);
    ExportedServer serves it without model code/config/checkpoint,
    matching the live server's predictions exactly."""
    from nlt_tpu.serve import Server, ExportedServer
    from nlt_tpu.datasets import get_dataset_class
    _, _, outdir = trained
    server = Server(join(outdir, "checkpoints"))
    server.precompute_obs(n_obs_batches=1)
    ds = get_dataset_class("nlt")(server.config, "test")
    batch = next(iter(ds.iterate(seed=0)))
    want = server.predict(batch)

    bs = batch["base"].shape[0]
    path = str(tmp_path / "served.nltx")
    # Bundle TWO batch sizes in one artifact (a server taking both
    # interactive bs-1 queries and sweep batches deploys one file).
    server.export(path, batch, bs_list=[1, bs])
    loaded = ExportedServer(path)
    assert loaded.batch_sizes == sorted({1, bs})
    got = loaded.predict(batch)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)

    # The bs-1 program dispatches on the request's leading dim and
    # matches the live server's bs-1 prediction exactly.
    batch1 = {k: (v[:1] if not isinstance(v, list) else v[:1])
              for k, v in batch.items()}
    want1 = server.predict(batch1)
    got1 = loaded.predict(batch1)
    np.testing.assert_array_equal(
        got1["pred_camspc"], want1["pred_camspc"])

    # An unbundled batch size is a loud error, not a silent recompile.
    if bs > 2:
        bad = {k: (v[:2] if not isinstance(v, list) else v)
               for k, v in batch.items()}
        with pytest.raises(AssertionError):
            loaded.predict(bad)


def test_trainvali_capped_static_cache_losses_equal(tmp_path, scene_root):
    """A capacity-capped GT-feature cache (some examples cached, some
    re-extracted each step) must train to the same losses as the
    unlimited cache — the capped rows feed fresh extractions directly."""
    from nlt_tpu import trainvali
    losses = {}
    for tag, cap in (("full", 6144), ("capped", 0)):
        d = tmp_path / tag
        d.mkdir()
        ini = write_ini(
            d, scene_root, epochs=2,
            loss="barron,1e+0lpips", lpips_max_res=32,
            cache_static=True, cache_static_mb=cap,
            outroot=str(tmp_path / ("out_" + tag)),
            xname="cap_" + tag)
        outdir = trainvali.main(["--config", ini])
        scalars = join(outdir, "summary_train", "scalars.jsonl")
        losses[tag] = [
            json.loads(line)["value"] for line in open(scalars)
            if json.loads(line)["tag"] == "loss_train"]
    assert losses["capped"] == pytest.approx(losses["full"], rel=1e-6)


def test_trainvali_barron_lpips(tmp_path, scene_root):
    """One epoch end to end with the flagship loss spec."""
    from nlt_tpu import trainvali
    ini = write_ini(tmp_path, scene_root, epochs=1,
                    loss="barron,1e+0lpips", lpips_max_res=32,
                    xname="barronrun_{lr}")
    outdir = trainvali.main(["--config", ini, "--debug"])
    scalars = join(outdir, "summary_train", "scalars.jsonl")
    recs = [json.loads(line) for line in open(scalars)]
    losses = [r for r in recs if r["tag"] == "loss_train"]
    assert losses and np.isfinite(losses[0]["value"])


def test_serve_and_infer_with_device_normalize(trained, scene_root,
                                               tmp_path):
    """uint8 wire format works through training, serving, and the
    averaged-obs inference path."""
    from nlt_tpu import trainvali, nlt_test
    ini = write_ini(tmp_path, scene_root, epochs=1,
                    device_normalize=True, cache="ram",
                    xname="u8run_{lr}")
    outdir = trainvali.main(["--config", ini])
    view_at = nlt_test.main([
        "--ckpt", join(outdir, "checkpoints"), "--n_obs_batches", "1"])
    assert os.path.exists(view_at)

    from nlt_tpu.serve import Server
    from nlt_tpu.datasets import get_dataset_class
    server = Server(join(outdir, "checkpoints"))
    server.precompute_obs(n_obs_batches=1)
    ds = get_dataset_class("nlt")(server.config, "test")
    batch = next(iter(ds.iterate(seed=0)))
    assert batch["base"].dtype == np.uint8
    out = server.predict(batch)
    assert np.all(np.isfinite(out["pred_camspc"]))


def test_trainvali_grad_accum(tmp_path, scene_root):
    """Full driver run with grad_accum=2 (+ the static cache): scanned
    microbatch steps train, checkpoint, and write vis end to end."""
    from nlt_tpu import trainvali
    ini = write_ini(tmp_path, scene_root, epochs=1, grad_accum=2,
                    loss="barron", lpips_cache_gt=True,
                    xname="gradaccum")
    outdir = trainvali.main(["--config", ini])
    scalars = join(outdir, "summary_train", "scalars.jsonl")
    recs = [json.loads(line) for line in open(scalars)]
    assert any(r["tag"] == "loss_train" for r in recs)
    vis = glob(join(outdir, "vis_train", "epoch*", "batch*"))
    assert vis


def test_trainvali_ema(tmp_path, scene_root):
    """ema_decay: the EMA pytree is trained, checkpointed, restored,
    and preferred by the inference driver."""
    from nlt_tpu import nlt_test, trainvali
    from nlt_tpu.parallel import train as train_mod
    from nlt_tpu.utils import config as config_mod
    ini = write_ini(tmp_path, scene_root, epochs=1, ema_decay=0.99,
                    xname="emarun")
    outdir = trainvali.main(["--config", ini])
    config = config_mod.read_config(ini)
    model, state = nlt_test.restore_model(
        config, join(outdir, "checkpoints"))
    assert "ema_params" in state
    # restore_model must hand out the EMA weights as the params.
    for a, b in zip(jax.tree.leaves(state["params"]),
                    jax.tree.leaves(state["ema_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fence_grad_accum_auto_and_warn():
    """The gather-cliff fence (trainvali.fence_grad_accum): bs-8 512^2
    on one device auto-sets grad_accum=2; an explicit grad_accum is
    respected (warn only); small runs are untouched."""
    from nlt_tpu import trainvali as tv
    from nlt_tpu.utils.config import Config

    base = {"bs": 8, "uvh": 512, "uvw": 512}
    # Auto: 8*512^2 = 2.1M rows > 1.5M -> split to 2 micros of 1.05M.
    assert tv.fence_grad_accum(Config(dict(base)), n_devices=1) == 2
    # Explicit grad_accum=1 pinned by the user: warn, don't override.
    assert tv.fence_grad_accum(
        Config(dict(base, grad_accum=1)), n_devices=1) == 1
    # Under the cliff: untouched.
    assert tv.fence_grad_accum(
        Config({"bs": 4, "uvh": 512, "uvw": 512}), n_devices=1) == 1
    # Data-parallel devices divide the per-device batch first.
    assert tv.fence_grad_accum(
        Config(dict(base)), n_devices=2) == 1
    # Tile devices don't (they shard space, not batch).
    assert tv.fence_grad_accum(
        Config(dict(base)), n_devices=2, n_tile=2) == 2
    # bs 16 on one device needs 4 microbatches.
    assert tv.fence_grad_accum(
        Config({"bs": 16, "uvh": 512, "uvw": 512}), n_devices=1) == 4
    # Non-power-of-two bs over the cliff: smallest divisor that
    # fences (bs=6 -> 2 micros of 3; the old doubling loop gave up).
    assert tv.fence_grad_accum(
        Config({"bs": 6, "uvh": 512, "uvw": 512}), n_devices=1) == 2
    # bs=9: only 3 divides it under the cliff.
    assert tv.fence_grad_accum(
        Config({"bs": 9, "uvh": 512, "uvw": 512}), n_devices=1) == 3


def test_trainvali_take_compact_losses_equal(tmp_path, scene_root):
    """Forward-take compaction (take_compact_frac, VERDICT r3 #2) is an
    exact rewrite: the cached-statics driver run with compaction
    trains to the same losses as without it."""
    from nlt_tpu import trainvali
    losses = {}
    for tag, frac in (("full", 0.0), ("compact", 0.8)):
        d = tmp_path / tag
        d.mkdir()
        ini = write_ini(
            d, scene_root, epochs=2,
            loss="barron,1e+0lpips", lpips_max_res=32,
            cache_static=True, take_compact_frac=frac,
            outroot=str(tmp_path / ("out_" + tag)),
            xname="tc_" + tag)
        outdir = trainvali.main(["--config", ini])
        scalars = join(outdir, "summary_train", "scalars.jsonl")
        losses[tag] = [
            json.loads(line)["value"] for line in open(scalars)
            if json.loads(line)["tag"] == "loss_train"]
    assert losses["compact"] == pytest.approx(losses["full"], rel=1e-6)


def test_trainvali_on_torus_regime_scene(tmp_path):
    """The full driver trains on the dragon-REGIME data contract
    (multi-island atlas, splat-holed UV buffers, discontinuous warps
    — data_gen/synthesize.py --shape=torus): losses finite and
    decreasing, vis written. Guards the pipeline against regressions
    that only benign single-chart data would hide."""
    from nlt_tpu import trainvali
    root = str(tmp_path / "torus")
    subprocess.run(
        [sys.executable, join(REPO, "data_gen", "synthesize.py"),
         "--outroot", root, "--n_cams", "3", "--n_lights", "3",
         "--n_test", "2", "--imh", "32", "--uvs", "32",
         "--shape", "torus"],
        check=True, capture_output=True)
    ini = write_ini(tmp_path, root, epochs=2, xname="torusrun")
    outdir = trainvali.main(["--config", ini])
    scalars = join(outdir, "summary_train", "scalars.jsonl")
    losses = [json.loads(l)["value"] for l in open(scalars)
              if json.loads(l)["tag"] == "loss_train"]
    assert len(losses) == 2 and all(np.isfinite(v) for v in losses)
    assert losses[1] < losses[0], losses
    assert glob(join(outdir, "vis_vali", "epoch*", "batch*", "*_pred.png"))


def test_multi_scene_per_scene_vali_psnr(tmp_path, scene_root):
    """Multi-scene runs report the holdout-set statistics: overall
    psnr_vali mean/std/n over ALL held-out configs plus per-scene
    means (psnr_vali/<scene>) and per-id traces (psnr_vali_by_id with
    '<scene>/<id>' namespacing). This is the logging contract the
    round-5 multi-scene flagship quality rows are read from (no
    reference counterpart: the reference trains one scene per run and
    logs a single vali PSNR; nlt/trainvali.py:219-233)."""
    from nlt_tpu import trainvali
    root2 = str(tmp_path / "sphere2")
    subprocess.run(
        [sys.executable, join(REPO, "data_gen", "synthesize.py"),
         "--outroot", root2, "--n_cams", "3", "--n_lights", "3",
         "--n_test", "1", "--imh", "32", "--uvs", "32", "--seed", "7"],
        check=True, capture_output=True)
    ini = write_ini(
        tmp_path, scene_root, epochs=1,
        data_root="%s,%s" % (scene_root, root2),
        vali_batches=-1, xname="multiscene")
    outdir = trainvali.main(["--config", ini])
    recs = [json.loads(l) for l in
            open(join(outdir, "summary_vali", "scalars.jsonl"))]
    tags = {r["tag"] for r in recs}
    # The default C02xL002 holdout hits both 3x3 scenes: 2 vali configs.
    scene1 = os.path.basename(scene_root.rstrip("/"))
    scene2 = os.path.basename(root2.rstrip("/"))
    assert "psnr_vali" in tags
    assert "psnr_vali_std" in tags and "psnr_vali_n" in tags
    n = [r["value"] for r in recs if r["tag"] == "psnr_vali_n"]
    assert n and n[0] == 2
    assert "psnr_vali/%s" % scene1 in tags
    assert "psnr_vali/%s" % scene2 in tags
    by_id = [r["text"] for r in recs
             if r["tag"] == "psnr_vali_by_id" and "text" in r]
    assert by_id
    ids = set(json.loads(by_id[-1]))
    assert {i.split("/")[0] for i in ids} == {scene1, scene2}
    # The overall mean is the mean over all configs, not scene means.
    overall = [r["value"] for r in recs if r["tag"] == "psnr_vali"][-1]
    per_id = json.loads(by_id[-1])
    assert overall == pytest.approx(np.mean(list(per_id.values())), abs=1e-3)
