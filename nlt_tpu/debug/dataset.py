"""Dataset debug harness: poke at the host pipeline interactively.

Counterpart of the reference's debug workflow for tf.data's graph-mode
opacity (reference: nlt/debug/dataset.py:27-43, nlt/README.md:77-84).
Our pipeline is plain Python, so this is mostly a convenience: it loads
one example directly via the private loader, then iterates real batches,
dropping into IPython (if available) or pdb at each step.

Run:  python -m nlt_tpu.debug.dataset --config=<ini> [--mode=train]
"""

import argparse

from .. import datasets as datasets_mod
from ..utils import config as config_mod
from ..utils import logging as logutil

logger = logutil.Logger(loggee="debug/dataset")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "vali", "test"])
    p.add_argument("--n_batches", type=int, default=1)
    args = p.parse_args(argv)

    config = config_mod.read_config(args.config)
    Dataset = datasets_mod.get_dataset_class(config.get("dataset"))
    dataset = Dataset(config, args.mode)
    logger.info("%d examples, batch size %d", len(dataset), dataset.bs)

    # Load one example directly (bypasses threading).
    item = dataset._load_item(sorted(dataset.files)[0])
    logger.info("Single example fields:")
    for k, v in item.items():
        shape = getattr(v, "shape", None)
        logger.info("  %s: %s", k, shape if shape is not None else v)

    for i, batch in enumerate(dataset.iterate(seed=0)):
        if i >= args.n_batches:
            break
        logger.info("Batch %d:", i)
        for k, v in batch.items():
            shape = getattr(v, "shape", None)
            logger.info("  %s: %s", k, shape if shape is not None else v)
        try:
            from IPython import embed
            embed()
        except ImportError:
            import pdb
            pdb.set_trace()


if __name__ == "__main__":
    main()
