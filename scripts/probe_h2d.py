"""Probe: H2D bandwidth over the axon relay, and whether host->device
transfers overlap device compute (decides the reader-fed bench strategy).

Run: python scripts/probe_h2d.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu.utils.timing import measure_rtt


def main():
    print("backend:", jax.default_backend())
    rtt = measure_rtt()
    print(f"rtt: {rtt*1e3:.1f} ms")

    B = 49152
    ids = np.random.default_rng(0).integers(0, 2**31 - 1,
                                            size=(B, 26)).astype(np.int32)
    dense = np.random.default_rng(1).normal(size=(B, 13)).astype(np.float32)
    labels = np.zeros((B,), np.float32)
    nbytes = ids.nbytes + dense.nbytes + labels.nbytes
    print(f"batch bytes: {nbytes/1e6:.1f} MB")

    # 1) pure H2D: put + block
    for trial in range(3):
        t0 = time.time()
        a = jax.device_put(ids)
        b = jax.device_put(dense)
        c = jax.device_put(labels)
        jax.block_until_ready((a, b, c))
        dt = time.time() - t0 - rtt
        print(f"h2d put+block: {dt*1e3:.1f} ms  ({nbytes/dt/1e6:.0f} MB/s)")

    # 2) dispatch-only cost (how long does device_put hold the caller?)
    t0 = time.time()
    arrs = [jax.device_put(ids) for _ in range(4)]
    t1 = time.time()
    jax.block_until_ready(arrs)
    t2 = time.time()
    print(f"4x put dispatch: {(t1-t0)*1e3:.1f} ms, drain: {(t2-t1)*1e3:.1f} ms")

    # 3) overlap test: long matmul on device, transfers issued while it runs
    x = jnp.ones((8192, 8192), jnp.bfloat16)

    @jax.jit
    def burn(x):
        for _ in range(8):
            x = jnp.tanh(x @ x) * 1e-4
        return x

    r = burn(x)
    jax.block_until_ready(r)
    t0 = time.time()
    r = burn(x)
    jax.block_until_ready(r)
    burn_t = time.time() - t0 - rtt
    print(f"burn alone: {burn_t*1e3:.1f} ms")

    t0 = time.time()
    r = burn(x)
    a = jax.device_put(ids)
    b = jax.device_put(dense)
    jax.block_until_ready((r, a, b))
    both_t = time.time() - t0 - rtt
    print(f"burn+2puts concurrent: {both_t*1e3:.1f} ms "
          f"(overlap if ~= burn alone)")

    # 4) one big combined put vs three separate
    packed = np.concatenate([ids.view(np.uint8).reshape(B, -1),
                             dense.view(np.uint8).reshape(B, -1),
                             labels.view(np.uint8).reshape(B, -1)], axis=1)
    t0 = time.time()
    p = jax.device_put(packed)
    jax.block_until_ready(p)
    dt = time.time() - t0 - rtt
    print(f"one packed put: {dt*1e3:.1f} ms ({packed.nbytes/dt/1e6:.0f} MB/s)")


if __name__ == "__main__":
    main()
