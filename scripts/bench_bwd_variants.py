"""Experiment: bwd-kernel variants for the fused cross+conv op.

PLATFORM_NOTES' production budget attributes 26.3 ms/step to the bwd
kernel (bt=128) with only ~4 ms of MXU MACs — the rest is VPU
relayouts + per-pair assembly. This times the SHIPPED fm bwd against
restructured variants on the real chip (RTT-corrected):

  v0: shipped _bwd_pallas (fm, lin) — baseline
  v1: direct slice-write dE scratch (one (F, w_phys, bt) scratch, two
      contiguous writes per anchor) replacing the per-pair
      de_blocks/concat assembly; dW+dM loops merged to share the
      gp-window slices.

NOTE (record script): v1's restructuring was merged in round 4
(353714e) and v2's sublane-dot restructure in round 5, so
v0 == shipped == v2 now; v1 is the pre-round-5 kernel kept for A/B.
`--check` therefore compares against the shipped kernel (itself
parity-proven vs jax.grad of the reference in
tests/test_kernel_parity.py + scripts/check_onchip_parity.py); give
any genuinely new variant its own reference before trusting --check.
Measured 2026-08-20 (B=65536, bt=128): v1 27.08 ms, v2 18.10 ms.

Usage: python scripts/bench_bwd_variants.py [--batch=65536] [--bts=128]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cffm_tpu.config import get_config
from cffm_tpu.ops import interaction_conv as ic
from cffm_tpu.utils.timing import measure_rtt


def _bwd_kernel_v1(e_ref, wr_ref, g_ref, gl_ref, de_ref, dw_ref,
                   m2t, dm2, gp, des, *, cfg, p_pad, bt, c1, w_phys):
    f, d, k = cfg.num_fields, cfg.embed_dim, cfg.conv_kernel
    half = k // 2

    et = ic._build_et_fm(e_ref)
    ic._build_m2t(et, m2t, cfg, p_pad, bt)

    g_t = g_ref[...].T.reshape(c1, d, bt)
    for h in range(half):
        gp[h] = jnp.zeros((c1, bt), gp.dtype)
        gp[d + half + h] = jnp.zeros((c1, bt), gp.dtype)
    gp[half: d + half] = jnp.swapaxes(g_t, 0, 1)

    # merged dW / dM loop: one gp-window slice serves both dots
    wr = wr_ref[...]
    dw_all = jnp.zeros((p_pad, k * c1), jnp.float32)
    for xin in range(d):
        gw = gp[xin: xin + k].reshape(k * c1, bt)
        dw_all += jax.lax.dot_general(
            m2t[xin + half], gw,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dm2[xin] = jax.lax.dot_general(
            wr, gw, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dm2.dtype)
    for t in range(k):
        dw_ref[0, t] = dw_all[:, (k - 1 - t) * c1: (k - t) * c1].astype(
            dw_ref.dtype)

    # dE via direct slice writes into a (F, w_phys, bt) scratch
    dm = jnp.swapaxes(dm2[...], 0, 1)  # (P_pad, d, Bt)
    zero_d = jnp.zeros((1, d, bt), dm.dtype)
    off = 0
    for i in range(f):
        ni = f - 1 - i
        if ni == 0:
            break
        a = et[i, (i + 1) * d: f * d, :].reshape(ni, d, bt)
        b = et[i + 1: f, i * d: (i + 1) * d, :]
        chunk = dm[off: off + ni]
        des[i, (i + 1) * d: f * d, :] = (chunk * b.astype(dm.dtype)
                                         ).reshape(ni * d, bt)
        des[i + 1: f, i * d: (i + 1) * d, :] = chunk * a.astype(dm.dtype)
        off += ni
    for i in range(f):
        des[i, i * d: (i + 1) * d, :] = zero_d[0]
    lw = cfg.row_width
    glin = gl_ref[0:1, :].astype(des.dtype)  # (1, Bt)
    des[:, lw: lw + 1, :] = jnp.broadcast_to(glin[None], (f, 1, bt))
    if w_phys > lw + 1:
        des[:, lw + 1:, :] = jnp.zeros((f, w_phys - lw - 1, bt), des.dtype)

    de_ref[...] = jnp.swapaxes(des[...], 1, 2).astype(de_ref.dtype)


def bwd_v1(emb3, wr, g, glin, cfg, bt):
    f, b, w_phys = emb3.shape
    p_pad, kc = wr.shape
    k = cfg.conv_kernel
    c1 = kc // k
    d = cfg.embed_dim
    dtype = emb3.dtype
    kernel = functools.partial(_bwd_kernel_v1, cfg=cfg, p_pad=p_pad, bt=bt,
                               c1=c1, w_phys=w_phys)
    e_spec = pl.BlockSpec((f, bt, w_phys), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    de, dw = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            e_spec,
            pl.BlockSpec((p_pad, kc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, c1 * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            e_spec,
            pl.BlockSpec((1, k, p_pad, c1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, b, w_phys), dtype),
            jax.ShapeDtypeStruct((b // bt, k, p_pad, c1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d + 2 * (k // 2), p_pad, bt), dtype),
            pltpu.VMEM((d, p_pad, bt), dtype),
            pltpu.VMEM((d + 2 * (k // 2), c1, bt), dtype),
            pltpu.VMEM((f, w_phys, bt), dtype),   # des
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ic._VMEM_LIMIT),
    )(emb3, wr, g,
      jnp.broadcast_to(glin.astype(jnp.float32)[None, :], (8, b)))
    return de, jnp.sum(dw, axis=0)


def _bwd_kernel_v2(e_ref, wrs_ref, g_ref, gl_ref, de_ref, dw_ref,
                   m2t, gp, des, *, cfg, p_pad, bt, c1, w_phys):
    """v2 (round 5): sublane-contracting one-big-dot restructure.

    probe_dot_orient.py (2026-08-20, real chip): dims ((0,),(0,))
    sublane-contraction runs at 136.4 TMAC/s vs 6.5 (lane, the shipped
    dW orientation) and 6.8 (lhs-lane rhs-sublane, the shipped dM
    orientation) — Mosaic only lowers the A^T B sublane-contraction
    natively; every other orientation pays internal relayouts. So:
    both per-xin dot loops collapse into ONE dot each with the (x, b)
    pair as a d*Bt-deep sublane contraction:
      dW  = A^T GWS,  A (d*Bt, P_pad) = transposed M2 rows,
                      GWS (d*Bt, k*C1) = stacked gp tap windows
      dM  = WRS^T GW2, WRS (k*C1, P_pad) = host-transposed weights,
                      GW2 (k*C1, d*Bt) = the same windows, C1-major
    and dM's output (P_pad, d*Bt) IS the assembly's dm layout — the
    old dm2 scratch + swapaxes disappear."""
    f, d, k = cfg.num_fields, cfg.embed_dim, cfg.conv_kernel
    half = k // 2

    et = ic._build_et_fm(e_ref)
    ic._build_m2t(et, m2t, cfg, p_pad, bt)

    g_t = g_ref[...].T.reshape(c1, d, bt)
    for h in range(half):
        gp[h] = jnp.zeros((c1, bt), gp.dtype)
        gp[d + half + h] = jnp.zeros((c1, bt), gp.dtype)
    gp[half: d + half] = jnp.swapaxes(g_t, 0, 1)

    # Bt-sublane-major window buffers (values; ~0.8 MB each at bench
    # shapes) + the m2 transpose that buys both fast dots
    a_m2 = jnp.swapaxes(m2t[half: half + d], 1, 2)       # (d, Bt, P_pad)
    gws = jnp.concatenate(
        [jnp.swapaxes(gp[t: t + d], 1, 2) for t in range(k)],
        axis=2)                                          # (d, Bt, k*C1)
    dw_all = jax.lax.dot_general(
        a_m2.reshape(d * bt, p_pad), gws.reshape(d * bt, k * c1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for t in range(k):
        dw_ref[0, t] = dw_all[:, (k - 1 - t) * c1: (k - t) * c1].astype(
            dw_ref.dtype)

    wrs = wrs_ref[...]                                   # (k*C1, P_pad)
    gw2 = jnp.concatenate(
        [jnp.swapaxes(gp[t: t + d], 0, 1).reshape(c1, d * bt)
         for t in range(k)], axis=0)                     # (k*C1, d*Bt)
    dm = jax.lax.dot_general(
        wrs, gw2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32
    ).reshape(p_pad, d, bt).astype(m2t.dtype)            # == old dm layout

    zero_d = jnp.zeros((1, d, bt), dm.dtype)
    off = 0
    for i in range(f):
        ni = f - 1 - i
        if ni == 0:
            break
        a = et[i, (i + 1) * d: f * d, :].reshape(ni, d, bt)
        b = et[i + 1: f, i * d: (i + 1) * d, :]
        chunk = dm[off: off + ni]
        des[i, (i + 1) * d: f * d, :] = (chunk * b.astype(dm.dtype)
                                         ).reshape(ni * d, bt)
        des[i + 1: f, i * d: (i + 1) * d, :] = chunk * a.astype(dm.dtype)
        off += ni
    for i in range(f):
        des[i, i * d: (i + 1) * d, :] = zero_d[0]
    lw = cfg.row_width
    glin = gl_ref[0:1, :].astype(des.dtype)  # (1, Bt)
    des[:, lw: lw + 1, :] = jnp.broadcast_to(glin[None], (f, 1, bt))
    if w_phys > lw + 1:
        des[:, lw + 1:, :] = jnp.zeros((f, w_phys - lw - 1, bt), des.dtype)

    de_ref[...] = jnp.swapaxes(des[...], 1, 2).astype(de_ref.dtype)


def bwd_v2(emb3, wrs, g, glin, cfg, bt):
    f, b, w_phys = emb3.shape
    kc, p_pad = wrs.shape
    k = cfg.conv_kernel
    c1 = kc // k
    d = cfg.embed_dim
    dtype = emb3.dtype
    kernel = functools.partial(_bwd_kernel_v2, cfg=cfg, p_pad=p_pad, bt=bt,
                               c1=c1, w_phys=w_phys)
    e_spec = pl.BlockSpec((f, bt, w_phys), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    de, dw = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            e_spec,
            pl.BlockSpec((kc, p_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, c1 * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            e_spec,
            pl.BlockSpec((1, k, p_pad, c1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, b, w_phys), dtype),
            jax.ShapeDtypeStruct((b // bt, k, p_pad, c1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d + 2 * (k // 2), p_pad, bt), dtype),  # M2T halo
            pltpu.VMEM((d + 2 * (k // 2), c1, bt), dtype),     # gp halo
            pltpu.VMEM((f, w_phys, bt), dtype),                # des
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ic._VMEM_LIMIT),
    )(emb3, wrs, g,
      jnp.broadcast_to(glin.astype(jnp.float32)[None, :], (8, b)))
    return de, jnp.sum(dw, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--bts", default="128")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    cfg = get_config("criteo_kaggle").model
    b = args.batch
    f, wp = cfg.num_fields, cfg.table_width
    d, k = cfg.embed_dim, cfg.conv_kernel
    c1 = cfg.conv_channels[0]
    p_pad = ((cfg.num_pairs + 7) // 8) * 8

    emb3 = jax.jit(lambda key: jax.random.normal(
        key, (f, b, wp), jnp.bfloat16))(jax.random.key(0))
    g = jax.jit(lambda key: jax.random.normal(
        key, (b, c1 * d), jnp.bfloat16))(jax.random.key(1))
    glin = jax.jit(lambda key: jax.random.normal(
        key, (b,), jnp.float32))(jax.random.key(2))
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(0.1 * rng.normal(size=(c1, cfg.num_pairs, k)),
                     jnp.float32)
    # _prep_w_bwd returns the v2 (k*C1, P_pad) orientation since the
    # round-5 merge; v1 (the pre-merge kernel, kept for the record)
    # still wants (P_pad, k*C1)
    wrs = ic._prep_w_bwd(w1, cfg, p_pad, jnp.bfloat16)
    wr = jnp.asarray(wrs.T)
    jax.block_until_ready((emb3, g, glin, wr, wrs))
    rtt = measure_rtt()
    print(f"rtt={rtt*1e3:.1f}ms")

    variants = {
        "v0": jax.jit(lambda e, w, gg, gl, bt: ic._bwd_pallas(
            e, wrs, gg, cfg, bt, False, glin=gl, fm=True), static_argnums=4),
        "v1": jax.jit(lambda e, w, gg, gl, bt: bwd_v1(e, w, gg, gl, cfg, bt),
                      static_argnums=4),
        "v2": jax.jit(lambda e, w, gg, gl, bt: bwd_v2(e, wrs, gg, gl, cfg,
                                                      bt), static_argnums=4),
    }
    ref = None
    for bt in [int(x) for x in args.bts.split(",")]:
        for name, fn in variants.items():
            try:
                de, dw = fn(emb3, wr, g, glin, bt)
                jax.block_until_ready((de, dw))
                if args.check:
                    if ref is None:
                        ref = (np.asarray(de[:, :256].astype(jnp.float32)),
                               np.asarray(dw))
                    else:
                        np.testing.assert_allclose(
                            np.asarray(de[:, :256].astype(jnp.float32)),
                            ref[0], rtol=1e-2, atol=1e-2)
                        np.testing.assert_allclose(np.asarray(dw), ref[1],
                                                   rtol=1e-3, atol=1e-3)
                n = 10
                t0 = time.time()
                for _ in range(n):
                    de, dw = fn(emb3, wr, g, glin, bt)
                _ = float(jnp.sum(dw))
                dt = (time.time() - t0 - rtt) / n
                print(f"bt={bt} {name}: {dt*1e3:.2f} ms  {b/dt/1e6:.2f}M ex/s",
                      flush=True)
            except Exception as e:
                print(f"bt={bt} {name}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
