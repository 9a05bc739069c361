"""MLP with optional NeRF-style input-skip concatenation.

Functional counterpart of the reference's MLP network (reference:
nlt/networks/mlp.py:28-53); unused by the NLT model but part of the
framework surface. Operates on (..., C) feature tensors.
"""

import jax
import jax.numpy as jnp

from .elements import dense
from .seq import Network as BaseNetwork


class Network(BaseNetwork):
    def __init__(self, widths, act=None, skip_at=None):
        super().__init__()
        depth = len(widths)
        if act is None:
            act = [None] * depth
        assert len(act) == depth, (
            "If not None, `act` must have the same length as `widths`")
        for w, a in zip(widths, act):
            self.stages.append(dense(w, activation=a))
        self.skip_at = skip_at

    def apply(self, params, x):
        if self.skip_at is None:
            return super().apply(params, x)
        x_ = x
        for i, (stage, p) in enumerate(zip(self.stages, params)):
            y = stage.apply(p, x_)
            if i in self.skip_at:
                y = jnp.concatenate((y, x), axis=-1)
            x_ = y
        return y

    def init_params(self, key, in_ch):
        """Skip concats change downstream input widths, so init must
        mirror apply's dataflow."""
        if self.skip_at is None:
            return super().init_params(key, in_ch)
        params = []
        ch = in_ch
        for i, stage in enumerate(self.stages):
            key, sub = jax.random.split(key)
            p, ch_out = stage.init(sub, ch)
            params.append(p)
            ch = ch_out + (in_ch if i in self.skip_at else 0)
        return params, ch
