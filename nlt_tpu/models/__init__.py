"""Model registry: by-name dynamic class lookup
(reference: nlt/models/__init__.py:15-20)."""

from importlib import import_module


def get_model_class(name):
    mod = import_module("nlt_tpu.models." + name)
    return mod.Model
