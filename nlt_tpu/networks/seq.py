"""Sequential network: an ordered list of stages applied in turn.

Functional counterpart of the reference's layer-list container
(reference: nlt/networks/base.py:26-40, nlt/networks/seq.py:28-41).
`stages` is a list of elements.Layer; params is a per-stage list, so the
model layer can interleave per-stage applications (the NLT dual-path
U-Net taps every stage; reference: nlt/models/nlt.py:141-199).
"""

import jax


class Network:
    def __init__(self):
        self.stages = []

    @staticmethod
    def str2none(s):
        """'None'/'none' strings in configs mean Python None
        (reference: nlt/networks/base.py:34-40)."""
        if s is None:
            return None
        assert isinstance(s, str), "Call this only on strings"
        if s.lower() == "none":
            return None
        return s

    def init_params(self, key, in_ch):
        """Returns (params_list, out_ch)."""
        params = []
        ch = in_ch
        for stage in self.stages:
            key, sub = jax.random.split(key)
            p, ch = stage.init(sub, ch)
            params.append(p)
        return params, ch

    def apply(self, params, x):
        assert len(params) == len(self.stages)
        for stage, p in zip(self.stages, params):
            x = stage.apply(p, x)
        return x

    def apply_stage(self, params, stage_i, x):
        return self.stages[stage_i].apply(params[stage_i], x)

    def __len__(self):
        return len(self.stages)
