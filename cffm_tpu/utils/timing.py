"""Device timing harness for the axon-relay TPU platform.

Two platform quirks (measured, see docs/PLATFORM_NOTES.md):
  1. block_until_ready() returns at dispatch-ack, NOT device completion
     -> apparent rates up to 250x hardware peak if trusted.
  2. A device->host readback (float()/np.asarray) costs a fixed ~30ms
     relay round trip.

Correct recipe: enqueue n executions (they serialize on the device
stream), force ONE readback, subtract the separately measured RTT.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _drain(r) -> float:
    leaf = jax.tree.leaves(r)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def measure_rtt(n: int = 5) -> float:
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    _drain(f(x))  # compile before timing
    t0 = time.time()
    for _ in range(n):
        _drain(f(x))
    return (time.time() - t0) / n


def device_time(f, *args, n: int = 20, rtt: float | None = None) -> float:
    """Seconds of device time per call of f(*args)."""
    if rtt is None:
        rtt = measure_rtt()
    r = f(*args)
    _drain(r)  # compile + warm
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    _drain(r)
    total = time.time() - t0
    return max(total - rtt, 1e-9) / n
