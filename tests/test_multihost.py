"""True multi-process distributed training on the CPU backend.

Runs the REAL trainvali driver as two coordinated processes
(jax.distributed + gloo CPU collectives, 1 virtual device each):
per-host data loading (disjoint example shards of each global batch),
global-array assembly via make_global_batch, compiler-inserted gradient
all-reduce, Orbax multi-host checkpointing, and host-0-only vis — the
complete pod-slice code path (SURVEY.md §2.5's TPU-native equivalent of
MirroredStrategy, which the reference never tested multi-node;
nlt/README.md:66-69) validated end to end without TPU hardware.
"""

import json
import os
import subprocess
import socket
import sys
from glob import glob
from os.path import dirname, join

import numpy as np
import pytest

from nlt_tpu.utils.config import Config

REPO = dirname(dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene_mh") / "sphere")
    subprocess.run(
        [sys.executable, join(REPO, "data_gen", "synthesize.py"),
         "--outroot", root, "--n_cams", "3", "--n_lights", "3",
         "--n_test", "2", "--imh", "32", "--uvs", "32"],
        check=True, capture_output=True)
    return root


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path, scene_root):
    outroot = str(tmp_path / "out")
    cfg = Config({
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
        "overwrite": True, "outroot": outroot,
        "xname": "mh2proc",
    })
    ini = str(tmp_path / "mh.ini")
    cfg.save(ini)

    port = _free_port()
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_ENABLE_X64="0",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "nlt_tpu.trainvali",
             "--config", ini, "--device", "cpu",
             "--coordinator_address", "127.0.0.1:%d" % port,
             "--num_processes", "2", "--process_id", str(i)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            "process %d failed:\n%s" % (i, out[-4000:]))

    outdir = join(outroot, "mh2proc")
    # Checkpoints saved by the multi-host Orbax contract.
    assert glob(join(outdir, "checkpoints", "*"))
    # Scalars + vali vis written by host 0 only.
    scalars = join(outdir, "summary_train", "scalars.jsonl")
    recs = [json.loads(line) for line in open(scalars)]
    losses = [r["value"] for r in recs if r["tag"] == "loss_train"]
    assert losses and all(np.isfinite(v) for v in losses)
    assert glob(join(outdir, "vis_vali", "epoch*", "batch*"))
    # Train vis is deliberately skipped on multi-host runs
    # (data-sharded batches are not host-addressable).
    assert "initialized: process" in outs[0]


def test_two_process_matches_single_process(tmp_path, scene_root):
    """The 2-process run's epoch losses equal a single-process run's:
    same global batches (seed-synchronized shuffle, per-host slices),
    same mean gradient (psum over 'data'), same updates."""
    base = {
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
        "lr": "1e-3", "mgm": -1, "epochs": 1,
        "ckpt_period": 1, "vali_period": -1, "vis_train_batches": 0,
        "vali_batches": 0, "keep_recent_epochs": 1,
        "overwrite": True,
    }
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_ENABLE_X64="0",
    )

    def losses_of(outdir):
        scalars = join(outdir, "summary_train", "scalars.jsonl")
        return [json.loads(l)["value"] for l in open(scalars)
                if json.loads(l)["tag"] == "loss_train"]

    # Single process.
    out1 = str(tmp_path / "out1")
    cfg = Config(dict(base, outroot=out1, xname="single"))
    ini1 = str(tmp_path / "single.ini")
    cfg.save(ini1)
    subprocess.run(
        [sys.executable, "-m", "nlt_tpu.trainvali",
         "--config", ini1, "--device", "cpu"],
        env=env, cwd=REPO, check=True, capture_output=True, timeout=600)

    # Two processes.
    out2 = str(tmp_path / "out2")
    cfg = Config(dict(base, outroot=out2, xname="dual"))
    ini2 = str(tmp_path / "dual.ini")
    cfg.save(ini2)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "nlt_tpu.trainvali",
             "--config", ini2, "--device", "cpu",
             "--coordinator_address", "127.0.0.1:%d" % port,
             "--num_processes", "2", "--process_id", str(i)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-4000:]

    l1 = losses_of(join(out1, "single"))
    l2 = losses_of(join(out2, "dual"))
    assert len(l1) == len(l2) == 1
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
