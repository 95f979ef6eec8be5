"""Probe: Mosaic lowering quality of sublane-contracting dots.

Gate for the bwd-kernel bt-sublane-major flip (NEXT_EXPERIMENTS #2):
the flip only pays if dot_general contracting dim 0 of BOTH operands
((bt,P) x (bt,kC) -> (P,kC)) runs at ~the same MXU rate as the current
lane-contracting orientation ((P,bt) x (kC,bt) contracting dim 1).

Times three kernels doing d=16 dependent dots per grid step over a
512-step grid (the bwd kernel's shape regime, B=65536/bt=128):
  lane : (P,bt)@(bt,kC) via dims ((1,),(1,))   [current bwd dW shape]
  sub  : (bt,P)@(bt,kC) via dims ((0,),(0,))   [flip candidate]
  rhs  : (bt,kC)@(kC,P) via dims ((1,),(0,))   [native lhs-lanes x rhs-sublanes]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cffm_tpu.utils.timing import measure_rtt

BT, P, KC, D, STEPS = 128, 744, 192, 16, 512


def _mk(mode):
    out_shape = (BT, P) if mode == "rhs" else (P, KC)

    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros(out_shape, jnp.float32)
        a = a_ref[...]
        b = b_ref[...]
        for _ in range(D):
            if mode == "lane":
                acc = acc + jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif mode == "sub":
                acc = acc + jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:  # rhs: flipped dM dot, (BT,KC)@(KC,P) native orientation
                acc = acc + jax.lax.dot_general(
                    b, a, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)

    return kernel


def run(mode):
    if mode == "lane":
        a_shape, b_shape = (P, BT), (KC, BT)
    elif mode == "sub":
        a_shape, b_shape = (BT, P), (BT, KC)
    else:
        a_shape, b_shape = (KC, P), (BT, KC)  # b@a: (BT,KC)@(KC,P)
    a = jax.jit(lambda k: jax.random.normal(k, a_shape, jnp.bfloat16))(
        jax.random.key(0))
    b = jax.jit(lambda k: jax.random.normal(k, b_shape, jnp.bfloat16))(
        jax.random.key(1))
    fn = jax.jit(lambda a, b: pl.pallas_call(
        _mk(mode),
        grid=(STEPS,),
        in_specs=[pl.BlockSpec(a_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(b_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BT, P) if mode == "rhs" else (P, KC),
                               lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (BT, P) if mode == "rhs" else (P, KC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b))
    out = fn(a, b)
    jax.block_until_ready(out)
    rtt = measure_rtt()
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = fn(a, b)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0 - rtt) / n
    macs = STEPS * D * BT * P * KC
    print(f"{mode}: {dt*1e3:.2f} ms  {macs/dt/1e12:.1f} TMAC/s", flush=True)


if __name__ == "__main__":
    for m in ("lane", "sub", "rhs"):
        try:
            run(m)
        except Exception as e:
            print(f"{m}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
