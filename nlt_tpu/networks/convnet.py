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

import os

import numpy as np

from ..utils import net as netutil
from .elements import (Layer, act, conv, deconv, iden, norm, pool,
                       sequential, upconv)
from .seq import Network as BaseNetwork

# Fused Pallas stage kernels (ops/fused_stage.py): run a whole
# contracting/expanding stage (two convs + activations) as one VMEM
# residency instead of separate XLA einsums. Applies only to the
# shipped configuration shape (kernel == stride == 2, no norm/pool,
# relu/leakyrelu); other configs keep the sequential path. Off-TPU the
# kernels run in the Pallas interpreter, so the same program dry-runs
# on CPU meshes. Flag: NLT_TPU_FUSED_STAGE=1 (A/B measured at the
# full-step level; see RESULTS.md).
_FUSED_STAGE = os.environ.get("NLT_TPU_FUSED_STAGE", "0") == "1"
# Route only stages whose input channel count reaches this threshold
# to the fused kernel (thin-channel stages pad every VMEM buffer to
# 128 lanes and lose to XLA's fused einsums; see ops/fused_stage.py
# and RESULTS.md round-2 A/B).
_FUSED_MIN_CH = int(os.environ.get("NLT_TPU_FUSED_MIN_CH", "0"))
_ACT_SLOPE = {"relu": 0.0, "leakyrelu": 0.3}


def _fused_stage_layer(seq_layer, kind, conv_idx, slope):
    """Wrap a sequential stage Layer with a fused-kernel apply that
    reads the SAME params structure (checkpoint-compatible; init and
    name are the sequential's own)."""
    import jax

    from ..ops import fused_stage as fs

    i1, i2 = conv_idx
    fused_fn = (fs.contract_stage if kind == "contract"
                else fs.expand_stage)

    def apply(params, x):
        if x.shape[3] < _FUSED_MIN_CH:
            return seq_layer.apply(params, x)
        interpret = jax.default_backend() != "tpu"
        return fused_fn(
            x, params[i1]["w"].astype(x.dtype),
            params[i1]["b"].astype(x.dtype),
            params[i2]["w"].astype(x.dtype),
            params[i2]["b"].astype(x.dtype),
            slope, interpret)

    return Layer(seq_layer.init, apply, seq_layer.name)


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

        fusable = (_FUSED_STAGE and norm_type is None
                   and pool_type is None and kernel == stride == 2
                   and act_type in _ACT_SLOPE)

        for n in n_feat[:-1]:
            if n >= prev_n:  # 64 -> 64 counts as contracting
                stage = sequential([
                    conv(kernel, n, stride=stride),
                    mknorm(),
                    act(act_type),
                    conv(kernel, n, stride=1),
                    mknorm(),
                    act(act_type),
                    pool(pool_type),
                ], name="contract%d" % n)
                if fusable:
                    stage = _fused_stage_layer(
                        stage, "contract", (0, 3), _ACT_SLOPE[act_type])
                self.stages.append(stage)
                self.is_contracting.append(True)
                change = 1.0 / stride
                if pool_type is not None:
                    change *= 0.5
                self.spatsize_changes.append(change)
            else:
                stage = sequential([
                    iden() if pool_type is None else upconv(n),
                    deconv(kernel, n, stride=stride),
                    mknorm(),
                    act(act_type),
                    deconv(kernel, n, stride=1),
                    mknorm(),
                    act(act_type),
                ], name="expand%d" % n)
                if fusable:
                    stage = _fused_stage_layer(
                        stage, "expand", (1, 4), _ACT_SLOPE[act_type])
                self.stages.append(stage)
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
