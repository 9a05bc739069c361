"""Microbenchmark: fused Pallas stage kernels vs the production XLA
stage path (elements s2d einsums + shifted matmuls), at the flagship
512^2/depth-256 stage shapes (bs 4), fwd-only and fwd+bwd.

Run on the real TPU:  python tools/bench_fused_stage.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("NLT_TPU_COMPILE_CACHE",
                                 "/tmp/nlt_tpu_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nlt_tpu.networks import elements as el
from nlt_tpu.ops import fused_stage as fs
from nlt_tpu.utils.timing import slope_time


def lrelu(v):
    return jax.nn.leaky_relu(v, negative_slope=0.3)


def stage_xla_contract(x, w1, b1, w2, b2):
    c1 = el.conv(2, w1.shape[3], stride=2)
    c2 = el.conv(2, w2.shape[3], stride=1)
    return lrelu(c2.apply({"w": w2, "b": b2},
                          lrelu(c1.apply({"w": w1, "b": b1}, x))))


def stage_xla_expand(x, w1, b1, w2, b2):
    d1 = el.deconv(2, w1.shape[3], stride=2)
    d2 = el.deconv(2, w2.shape[3], stride=1)
    return lrelu(d2.apply({"w": w2, "b": b2},
                          lrelu(d1.apply({"w": w1, "b": b1}, x))))


def chain_fwd(fn, x, params):
    @jax.jit
    def step(x):
        y = fn(x, *params)
        # chain: collapse y back to x's shape via a cheap reduction
        return x * (1 + 1e-12 * jnp.mean(y))

    def run_n(n):
        v = x
        for _ in range(n):
            v = step(v)
        return float(jnp.mean(v))

    return run_n


def chain_grad(fn, x, params):
    @jax.jit
    def step(x):
        g = jax.grad(lambda xx: jnp.sum(fn(xx, *params)) * 1e-12)(x)
        return x + g

    def run_n(n):
        v = x
        for _ in range(n):
            v = step(v)
        return float(jnp.mean(v))

    return run_n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--n1", type=int, default=5)
    ap.add_argument("--n2", type=int, default=15)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)

    def t(*s):
        return jnp.asarray(rng.standard_normal(s).astype(dt))

    shapes_contract = [  # (H, C_in, O) at bs 4 (dual-path query stages)
        (512, 32, 32), (256, 64, 64), (128, 128, 128), (64, 256, 256)]
    shapes_expand = [  # (H_in, C_in, O)
        (32, 512, 128), (64, 256, 64), (128, 128, 32), (256, 64, 16)]

    print(f"device: {jax.devices()[0].device_kind}  dtype {dt.name}")
    for kind, shapes, xla_fn, fused_fn in [
            ("contract", shapes_contract, stage_xla_contract,
             fs.contract_stage),
            ("expand", shapes_expand, stage_xla_expand, fs.expand_stage)]:
        for h, c, o in shapes:
            x = t(args.bs, h, h, c)
            params = (t(2, 2, c, o) * 0.1, t(o) * 0.1,
                      t(2, 2, o, o) * 0.1, t(o) * 0.1)
            print(f"{kind} {h:4d}^2 c{c:<4d} o{o:<4d}", end="",
                  flush=True)
            for tag, chain in [("fwd", chain_fwd), ("f+b", chain_grad)]:
                tx = slope_time(chain(xla_fn, x, params),
                                n1=args.n1, n2=args.n2)
                print(f"  {tag}: xla {tx*1e3:7.3f}", end="", flush=True)
                try:
                    tf = slope_time(chain(fused_fn, x, params),
                                    n1=args.n1, n2=args.n2)
                    print(f" pallas {tf*1e3:7.3f} ms ({tx/tf:4.2f}x)",
                          end="", flush=True)
                except Exception as e:
                    print(f" pallas FAILED ({type(e).__name__})",
                          end="", flush=True)
            print(flush=True)


if __name__ == "__main__":
    main()
