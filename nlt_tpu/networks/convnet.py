"""Symmetric UV U-Net factory.

Functional JAX re-design of the reference's convnet
(reference: nlt/networks/convnet.py:31-90). Structure kept exactly:

- 1x1 conv in to produce an original-resolution feature map;
- for each channel count n in the schedule (utils.net.gen_feat_n):
  contracting stage when n >= previous
  [conv(k, s) -> norm -> act -> conv(k, 1) -> norm -> act -> pool]
  else expanding stage
  [upconv if pooling else iden -> deconv(k, s) -> norm -> act
   -> deconv(k, 1) -> norm -> act];
- final 1x1 conv to the last schedule entry (3 channels);
- `is_contracting` / `spatsize_changes` bookkeeping with the
  resolution-round-trip assert.

The model layer uses `is_contracting` to know where to tap skip
connections and inject observation features.
"""

import numpy as np

from ..utils import net as netutil
from .elements import act, conv, deconv, iden, norm, pool, sequential, upconv
from .seq import Network as BaseNetwork


class Network(BaseNetwork):
    def __init__(self, depth0, depth, kernel, stride, norm_type=None,
                 act_type="relu", pool_type=None, bn_prefix=""):
        super().__init__()
        norm_type = self.str2none(norm_type)
        pool_type = self.str2none(pool_type)
        n_feat = netutil.gen_feat_n(depth0, depth)
        self.n_feat = n_feat

        # Construction-stable unique names for BatchNorm moving-stats
        # keys (see elements.norm); bn_prefix disambiguates multiple
        # networks in one model (the NLT dual path).
        bn_count = iter(range(1 << 30))

        def mknorm():
            return norm(norm_type,
                        bn_name="%sbn%d" % (bn_prefix, next(bn_count)))

        prev_n = 0
        self.is_contracting, self.spatsize_changes = [], []

        # 1x1 conv in: original-resolution feature map.
        self.stages.append(conv(1, n_feat[0], stride=1))
        self.is_contracting.append(True)
        self.spatsize_changes.append(1)

        for n in n_feat[:-1]:
            if n >= prev_n:  # 64 -> 64 counts as contracting
                self.stages.append(sequential([
                    conv(kernel, n, stride=stride),
                    mknorm(),
                    act(act_type),
                    conv(kernel, n, stride=1),
                    mknorm(),
                    act(act_type),
                    pool(pool_type),
                ], name="contract%d" % n))
                self.is_contracting.append(True)
                change = 1.0 / stride
                if pool_type is not None:
                    change *= 0.5
                self.spatsize_changes.append(change)
            else:
                self.stages.append(sequential([
                    iden() if pool_type is None else upconv(n),
                    deconv(kernel, n, stride=stride),
                    mknorm(),
                    act(act_type),
                    deconv(kernel, n, stride=1),
                    mknorm(),
                    act(act_type),
                ], name="expand%d" % n))
                self.is_contracting.append(False)
                change = float(stride)
                if pool_type is not None:
                    change *= 2.0
                self.spatsize_changes.append(change)
            prev_n = n

        # Final 1x1 conv to the output channel count.
        self.stages.append(conv(1, n_feat[-1], stride=1))
        self.is_contracting.append(False)
        self.spatsize_changes.append(1)

        spatsizes = np.cumprod(self.spatsize_changes)
        assert spatsizes[-1] == 1, (
            "Resolution doesn't return to the original value")
