"""Dataset registry: by-name dynamic class lookup
(reference: nlt/datasets/__init__.py:15-20)."""

from importlib import import_module


def get_dataset_class(name):
    mod = import_module("nlt_tpu.datasets." + name)
    return mod.Dataset
