"""Network layer (L4): architectures as functional (init, apply) modules.

Registry mirrors the reference's dynamic lookup
(reference: nlt/networks/__init__.py — datasets/models use the same
pattern via importlib)."""

from importlib import import_module


def get_network_class(name):
    mod = import_module("nlt_tpu.networks." + name)
    return mod.Network
