"""Multi-process serving driver for the pod-slice test rig: brings up
jax.distributed, constructs serve.Server(shard=True) over the global
mesh, predicts one test batch (streamed AND through the device input
cache), and dumps host 0's packed predictions for byte comparison with
the single-process run (tests/test_multihost.py)."""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--coordinator_address", required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from nlt_tpu.parallel import mesh as mesh_mod
    mesh_mod.initialize_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id)

    import numpy as np
    from nlt_tpu.datasets import get_dataset_class
    from nlt_tpu.serve import Server

    server = Server(args.ckpt, pack="uint8", shard=True)
    server.precompute_obs(n_obs_batches=1)
    ds = get_dataset_class(server.config.get("dataset"))(
        server.config, "test")
    batch = next(iter(ds.iterate(seed=0)))

    streamed = server.predict(batch)
    cached1 = server.predict(batch, ids=batch["id"])
    cached2 = server.predict(batch, ids=batch["id"])  # cache hits

    # Remainder batch: bs that does NOT divide the data axis must take
    # the replicate path, not crash (every host computes it redundantly).
    batch3 = {k: v[:3] for k, v in batch.items()}
    rem = server.predict(batch3)

    if jax.process_index() == 0:
        np.savez(
            args.out,
            streamed=streamed["pred_camspc"],
            cached=cached1["pred_camspc"],
            cached_repeat=cached2["pred_camspc"],
            remainder=rem["pred_camspc"],
            cache_hits=np.asarray(server._input_cache.hits))
    # All hosts leave together (host 0 writes before the barrier).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("serve_mp_done")


if __name__ == "__main__":
    main()
