"""Micro-bench the fused cross+conv kernel fwd / fwd+bwd at several
batch tiles on the real chip (RTT-corrected). Usage:
  python scripts/bench_kernel.py [--batch=32768] [--bts=128,256,512]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu.config import get_config
from cffm_tpu.ops.interaction_conv import cross_conv1_pallas
from cffm_tpu.utils.timing import measure_rtt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--bts", default="128,256,512")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    cfg = get_config("criteo_kaggle").model
    b = args.batch
    # generate ON DEVICE: the (B, F, F*d) block is ~1.6GB — host staging
    # over the relay takes minutes
    emb = jax.jit(lambda k: jax.random.normal(
        k, (b, cfg.num_fields, cfg.row_width), jnp.dtype(args.dtype))
    )(jax.random.key(0))
    emb.block_until_ready()
    c1 = cfg.conv_channels[0]
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(
        0.1 * rng.normal(size=(c1, cfg.num_pairs, cfg.conv_kernel)),
        jnp.float32)
    rtt = measure_rtt()
    print(f"rtt={rtt*1e3:.1f}ms")

    for bt in [int(x) for x in args.bts.split(",")]:
        # forward only
        try:
            f = jax.jit(lambda e, w: cross_conv1_pallas(e, w, cfg, bt))
            y = f(emb, w1)
            n = 20
            t0 = time.time()
            for _ in range(n):
                y = f(emb, w1)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            dt = (time.time() - t0 - rtt) / n
            print(f"bt={bt} fwd: {dt*1e3:.2f} ms  {b/dt/1e6:.2f}M ex/s")
        except Exception as e:
            print(f"bt={bt} fwd: FAIL {type(e).__name__}: {str(e)[:120]}")
            continue
        # fwd+bwd
        try:
            def loss(e, w):
                return jnp.sum(cross_conv1_pallas(e, w, cfg, bt).astype(jnp.float32) ** 2)
            g = jax.jit(jax.grad(loss, argnums=(0, 1)))
            de, dw = g(emb, w1)
            n = 10
            t0 = time.time()
            for _ in range(n):
                de, dw = g(emb, w1)
            _ = float(jnp.sum(dw))
            dt = (time.time() - t0 - rtt) / n
            print(f"bt={bt} fwd+bwd: {dt*1e3:.2f} ms  {b/dt/1e6:.2f}M ex/s")
        except Exception as e:
            print(f"bt={bt} fwd+bwd: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
