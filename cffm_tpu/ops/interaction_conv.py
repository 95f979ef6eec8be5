"""Fused pairwise-cross + conv Pallas kernels (fwd + bwd).

The hot op of CFFM (SURVEY.md L3, BASELINE.json north_star: "fused
interaction-map build + conv kernel"). The interaction map
M ∈ (B, P, d) (P = F(F-1)/2 pairs) is never materialized in HBM: the
kernel reads the looked-up embedding rows once, builds M in VMEM, and
applies the first (heaviest: in_channels = P) conv layer there.
Remaining conv layers operate on the small (B, C1, d) activation and
are left to XLA.

TPU layout strategy (see pallas_guide.md tiling rules):
  - batch tile Bt rides the LANE axis (128);
  - per-field transpose E (Bt, F, W) -> ET (F, W, Bt) in VMEM (cheap:
    measured ~free vs the matmuls);
  - cross chunks for anchor field i are pure static slices of ET
    (no per-pair gather): A_i = ET[i, (i+1)d:Fd] and
    B_i = ET[i+1:F, id:(i+1)d], both already (n_i, d, Bt);
  - conv1 runs as d/2 MXU matmuls (2*C1, k1*P_pad) @ (k1*P_pad, Bt):
    the k taps are concatenated into one deep contraction (the tap
    window is a contiguous leading-axis slice of the zero-padded
    M2T (d+2, P_pad, Bt)), and two adjacent output positions are
    stacked to fill the 128 sublanes (weight matrix is banded
    [[W0 W1 W2 0], [0 W0 W1 W2]]). This replaced a 48-small-matmul
    version that ran at ~5% MXU utilization.

Backward rematerializes ET/M2T from E (standard remat) and emits dE and
dW1; bias/ReLU/pool live outside the kernel so their grads come from
XLA autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cffm_tpu.config import ModelConfig
from cffm_tpu.ops.cross import build_cross_map, conv_core_reference

_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Reference semantics for the fused op (conv layer 1, linear part only).
# ---------------------------------------------------------------------------


def cross_conv1_reference(emb: jax.Array, w1: jax.Array, cfg: ModelConfig) -> jax.Array:
    """emb: (B,F,d) or (B,F,F,d). w1: (C1, P, k). Returns (B, C1, d)."""
    m = build_cross_map(emb, cfg)  # (B, P, d)
    return jax.lax.conv_general_dilated(
        m, w1.astype(m.dtype), window_strides=(1,), padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


# ---------------------------------------------------------------------------
# Shared in-kernel helpers
# ---------------------------------------------------------------------------


def _build_et(e_ref, f: int, w: int, bt: int):
    """E block (Bt, F*W) -> ET value (F, W, Bt).

    The input block is FLAT 2D so the HBM->VMEM DMA copies contiguous
    48KB-per-example rows (a 3D (Bt, F, W) block made the DMA do ~1.2KB
    strided row copies and ran at ~43GB/s, 18x off HBM speed). One
    whole-tile transpose + sublane-aligned reshape happens in VMEM.
    """
    return e_ref[...].T.reshape(f, w, bt)


def _build_et_fm(e_ref):
    """Field-major E block (F, Bt, W) -> ET value (F, W, Bt).

    The fm layout's block is F contiguous (Bt, W) slabs (~0.6 MB each
    at bench shapes — far above the ~1.2KB strided-DMA pathology the
    flat-2D rule guards against), and the ET build becomes F batched
    2D transposes instead of one big transpose + reshape."""
    return jnp.swapaxes(e_ref[...], 1, 2)


def _build_m2t(et, m2t, cfg: ModelConfig, p_pad: int, bt: int):
    """Cross map, pair-transposed: M2T (d + 2*half, P_pad, Bt).

    Row half+x holds interaction position x; the half rows on each side
    stay zero (SAME-padding halo for the tap-window trick; half = k//2,
    so k=1 runs halo-free).
    """
    f, d = cfg.num_fields, cfg.embed_dim
    half = cfg.conv_kernel // 2
    fa = cfg.cross == "field_aware"
    for h in range(half):
        m2t[h] = jnp.zeros((p_pad, bt), m2t.dtype)
        m2t[d + half + h] = jnp.zeros((p_pad, bt), m2t.dtype)
    off = 0
    for i in range(f):
        ni = f - 1 - i
        if ni == 0:
            break
        if fa:
            a = et[i, (i + 1) * d : f * d, :].reshape(ni, d, bt)
            b = et[i + 1 : f, i * d : (i + 1) * d, :]
        else:
            a = et[i, :, :][None, :, :]  # (1, d, Bt) broadcast over ni
            b = et[i + 1 : f, :, :]
        m2t[half : d + half, off : off + ni, :] = jnp.swapaxes(
            (a * b).astype(m2t.dtype), 0, 1
        )
        off += ni
    if p_pad > off:
        m2t[half : d + half, off:p_pad, :] = jnp.zeros(
            (d, p_pad - off, bt), m2t.dtype)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(*args, cfg: ModelConfig,
                p_pad: int, bt: int, c1: int, w_phys: int, lin: bool,
                fm: bool = False, fm_parts: tuple | None = None):
    f, d, k = cfg.num_fields, cfg.embed_dim, cfg.conv_kernel
    kw = k + 1  # tap window width for the 2-stacked-output trick
    ne = len(fm_parts) if fm_parts else 1
    e_refs, w2_ref, refs = args[:ne], args[ne], args[ne + 1:]
    if lin:
        y_ref, lin_ref, m2t = refs
    else:
        (y_ref,), m2t = refs[:-1], refs[-1]

    if fm_parts:
        # split field-major operands (hybrid small/big lookup,
        # train._loss_fm_hybrid): the HBM-level concat of the one-hot
        # and gathered blocks measured 7.3 ms/step at criteo bench
        # shapes; concatenating the transposed blocks in VMEM here is
        # register-level
        et = jnp.concatenate([_build_et_fm(r) for r in e_refs], axis=0)
    elif fm:
        et = _build_et_fm(e_refs[0])
    else:
        et = _build_et(e_refs[0], f, w_phys, bt)
    _build_m2t(et, m2t, cfg, p_pad, bt)

    # ((k+1)*P_pad, 2*C1), pre-flattened AND pre-transposed on host:
    # the dot below contracts SUBLANES of both operands — the only
    # orientation Mosaic lowers without dot-internal relayouts
    # (probe_dot_orient.py: 136.4 vs 6.8 TMAC/s for the old
    # lhs-lane-contracting (2C1, kwP) @ (kwP, Bt) form).
    w2 = w2_ref[...]
    cols = []
    for x in range(0, d, 2):
        win = m2t[x : x + kw].reshape(kw * p_pad, bt)
        acc = jax.lax.dot_general(
            w2, win, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2*C1, Bt): rows [0,C1) -> output x, [C1,2C1) -> x+1
        cols.append(acc.reshape(2, c1, bt))
    y = jnp.stack(cols, axis=0)  # (d//2, 2, C1, Bt)
    y = jnp.swapaxes(y.reshape(d, c1, bt), 0, 1)  # (C1, d, Bt)
    y_ref[...] = y.reshape(c1 * d, bt).T.astype(y_ref.dtype)

    if lin:
        # first-order term from the fused column (row_width) of each
        # physical row: f32 sum over fields, broadcast over 8 sublanes
        # (the caller reads row 0) to avoid an in-kernel (bt,1) store.
        lw = cfg.row_width
        lin2 = jnp.sum(
            et[:, lw : lw + 1, :].reshape(f, bt).astype(jnp.float32),
            axis=0, keepdims=True)  # (1, Bt)
        lin_ref[...] = jnp.broadcast_to(lin2, (8, bt))


def _fwd_pallas(emb2d: jax.Array, w2: jax.Array, cfg: ModelConfig, bt: int,
                interpret: bool, lin: bool = False, fm: bool = False):
    """emb2d: (B, F*w_phys) flat physical rows (w_phys inferred; equals
    row_width on the sliced path, table_width on the full-rows path) —
    or, when fm=True, FIELD-MAJOR (F, B, w_phys) rows (the raw layout of
    a gather with transposed ids; kills the (B*F,W)->(B,F*W) retiling
    copy that fed this kernel, ~10 ms/step at criteo bench shapes).
    w2: ((k+1)*P_pad, 2*C1) — _prep_w_fwd's banded stacked layout,
    host-transposed so the kernel's dot contracts sublanes.
    When fm=True, emb2d may also be a TUPLE of field-major arrays
    ((F1, B, w), (F2, B, w), ...; field counts summing to F): the SPLIT
    operands of the hybrid small/big lookup, concatenated along the
    field axis in VMEM instead of HBM (the HBM concat measured 7.3
    ms/step at criteo bench shapes).
    Returns (B, C1*d) [+ (8, B) f32 lin sums]."""
    f = cfg.num_fields
    fm_parts = None
    if fm and isinstance(emb2d, (tuple, list)):
        parts = tuple(emb2d)
        fm_parts = tuple(int(p.shape[0]) for p in parts)
        assert sum(fm_parts) == f
        _, b, w_phys = parts[0].shape
    elif fm:
        parts = (emb2d,)
        _, b, w_phys = emb2d.shape
    else:
        parts = (emb2d,)
        b, fw = emb2d.shape
        w_phys = fw // f
    kwp, c2 = w2.shape
    c1 = c2 // 2
    kw = cfg.conv_kernel + 1
    p_pad = kwp // kw
    d = cfg.embed_dim
    dtype = parts[0].dtype

    kernel = functools.partial(_fwd_kernel, cfg=cfg, p_pad=p_pad, bt=bt,
                               c1=c1, w_phys=w_phys, lin=lin, fm=fm,
                               fm_parts=fm_parts)
    out_specs = [pl.BlockSpec((bt, c1 * d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, c1 * d), dtype)]
    if lin:
        out_specs.append(pl.BlockSpec((8, bt), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((8, b), jnp.float32))
    e_specs = _e_specs(parts, fm, bt, w_phys, f)
    outs = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=e_specs + [
            pl.BlockSpec((kwp, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((d + 2 * (cfg.conv_kernel // 2), p_pad, bt),
                       dtype),                       # M2T (padded halo)
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*parts, w2)
    return outs if lin else outs[0]


def _e_specs(parts, fm: bool, bt: int, w_phys: int, f: int):
    """BlockSpecs for the embedding operand(s): per-part field-major
    blocks, or one flat-2D block (see _build_et's DMA note)."""
    if fm:
        def mk(nf):
            return pl.BlockSpec((nf, bt, w_phys), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        return [mk(int(p.shape[0])) for p in parts]
    return [pl.BlockSpec((bt, f * w_phys), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(*args, cfg: ModelConfig,
                p_pad: int, bt: int, c1: int, w_phys: int, lin: bool,
                fm: bool = False, fm_parts: tuple | None = None):
    f, d, k = cfg.num_fields, cfg.embed_dim, cfg.conv_kernel
    fa = cfg.cross == "field_aware"
    half = k // 2
    ne = len(fm_parts) if fm_parts else 1
    e_refs = args[:ne]
    wr_ref, g_ref = args[ne], args[ne + 1]
    refs = args[ne + 2:]
    if fa:
        if lin:
            gl_ref = refs[0]
            de_refs = refs[1:1 + ne]
            dw_ref, m2t, gp, des = refs[1 + ne:]
        else:
            de_refs = refs[:ne]
            dw_ref, m2t, gp, des = refs[ne:]
    else:
        if lin:
            gl_ref = refs[0]
            de_refs = refs[1:1 + ne]
            dw_ref, m2t, gp = refs[1 + ne:]
        else:
            de_refs = refs[:ne]
            dw_ref, m2t, gp = refs[ne:]
    de_ref = de_refs[0]

    # Remat forward layout stages.
    if fm_parts:
        et = jnp.concatenate([_build_et_fm(r) for r in e_refs], axis=0)
    elif fm:
        et = _build_et_fm(e_refs[0])
    else:
        et = _build_et(e_refs[0], f, w_phys, bt)
    _build_m2t(et, m2t, cfg, p_pad, bt)

    # g (Bt, C1*d) -> gp (d + 2*half, C1, Bt) zero-padded halo.
    g_t = g_ref[...].T.reshape(c1, d, bt)
    for h in range(half):
        gp[h] = jnp.zeros((c1, bt), gp.dtype)
        gp[d + half + h] = jnp.zeros((c1, bt), gp.dtype)
    gp[half : d + half] = jnp.swapaxes(g_t, 0, 1)

    # ONE sublane-contracting dot per gradient (round 5; replaced the
    # per-xin merged loop — 27.1 -> 18.1 ms on the fm micro-bench at
    # B=65536/bt=128, scripts/bench_bwd_variants.py v2 2026-08-20).
    # probe_dot_orient.py measured Mosaic's dims ((0,),(0,)) A^T B
    # sublane-contraction at 136.4 TMAC/s vs 6.5 (lane-contracting, the
    # old dW orientation) and 6.8 (lhs-lane/rhs-sublane, the old dM) —
    # every non-native orientation pays dot-internal relayouts. Folding
    # the conv-position axis into the contraction ((x, b) pairs, d*Bt
    # deep) makes both gradients single native dots:
    #   dW = A^T GWS   A (d*Bt, P_pad): transposed M2 rows
    #                  GWS (d*Bt, k*C1): stacked gp tap windows
    #   dM = WRS^T GW2 WRS (k*C1, P_pad): host-transposed tap-reversed
    #                  weights; GW2 (k*C1, d*Bt): same windows, C1-major
    # dM's output (P_pad, d*Bt) IS the dE assembly's dm layout, so the
    # old dm2 scratch and its swapaxes disappear. The gp zero-halo rows
    # still supply the SAME-padding boundary taps inside the windows.
    a_m2 = jnp.swapaxes(m2t[half : half + d], 1, 2)      # (d, Bt, P_pad)
    gws = jnp.concatenate(
        [jnp.swapaxes(gp[t : t + d], 1, 2) for t in range(k)],
        axis=2)                                          # (d, Bt, k*C1)
    dw_all = jax.lax.dot_general(
        a_m2.reshape(d * bt, p_pad), gws.reshape(d * bt, k * c1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for t in range(k):
        dw_ref[0, t] = dw_all[:, (k - 1 - t) * c1 : (k - t) * c1].astype(
            dw_ref.dtype)

    wr = wr_ref[...]  # (k*C1, P_pad), pre-transposed on host
    gw2 = jnp.concatenate(
        [jnp.swapaxes(gp[t : t + d], 0, 1).reshape(c1, d * bt)
         for t in range(k)], axis=0)                     # (k*C1, d*Bt)
    # dE through the cross products (reads of et precede writes of de_ref).
    dm = jax.lax.dot_general(
        wr, gw2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(p_pad, d, bt).astype(m2t.dtype)            # (P_pad, d, Bt)
    if fa:
        # Direct slice-write assembly into the (F, w_phys, Bt) scratch:
        # anchor i's da chunk is CONTIGUOUS in field i's row
        # (des[i, (i+1)d:Fd]) and its db chunks form one strided 3D
        # slice (des[i+1:F, id:(i+1)d]) — two stores per anchor. This
        # replaced a per-pair de_blocks/concat/stack assembly that
        # measured 43.3 -> 27.2 ms on the fm bwd micro-bench (bt=128,
        # B=65536, scripts/bench_bwd_variants.py 2026-08-20; the merged
        # dW/dM loop above is the same experiment's other half).
        off = 0
        for i in range(f):
            ni = f - 1 - i
            if ni == 0:
                break
            a = et[i, (i + 1) * d : f * d, :].reshape(ni, d, bt)
            b = et[i + 1 : f, i * d : (i + 1) * d, :]
            chunk = dm[off : off + ni]
            des[i, (i + 1) * d : f * d, :] = (
                chunk * b.astype(dm.dtype)).reshape(ni * d, bt)
            des[i + 1 : f, i * d : (i + 1) * d, :] = chunk * a.astype(dm.dtype)
            off += ni
        zero_d = jnp.zeros((d, bt), dm.dtype)
        for i in range(f):
            des[i, i * d : (i + 1) * d, :] = zero_d
        if lin:
            # first-order gradient rides the fused column (row_width);
            # remaining pad lanes get exact zeros.
            lw = cfg.row_width
            glin = gl_ref[0:1, :].astype(des.dtype)  # (1, Bt)
            des[:, lw : lw + 1, :] = jnp.broadcast_to(glin[None], (f, 1, bt))
            if w_phys > lw + 1:
                des[:, lw + 1 :, :] = jnp.zeros((f, w_phys - lw - 1, bt),
                                                des.dtype)
        if fm_parts:
            # split field-major outputs: each part gets its slice of
            # the assembly scratch (static field ranges)
            off = 0
            for r, nf in zip(de_refs, fm_parts):
                r[...] = jnp.swapaxes(des[off:off + nf], 1, 2
                                      ).astype(r.dtype)
                off += nf
        elif fm:
            # field-major output (F, Bt, w_phys): batched 2D transpose,
            # the exact inverse of _build_et_fm
            de_ref[...] = jnp.swapaxes(des[...], 1, 2).astype(de_ref.dtype)
        else:
            de_ref[...] = des[...].reshape(f * w_phys, bt).T.astype(
                de_ref.dtype)
    else:
        acc = [jnp.zeros((d, bt), jnp.float32) for _ in range(f)]
        off = 0
        for i in range(f):
            ni = f - 1 - i
            if ni == 0:
                break
            b = et[i + 1 : f, :, :]
            chunk = dm[off : off + ni].astype(jnp.float32)
            acc[i] = acc[i] + jnp.sum(chunk * b.astype(jnp.float32), axis=0)
            da = chunk * et[i, :, :][None, :, :].astype(jnp.float32)
            for jj in range(ni):
                acc[i + 1 + jj] = acc[i + 1 + jj] + da[jj]
            off += ni
        de_full = jnp.concatenate(acc, axis=0)  # (F*d, Bt)
        de_ref[...] = de_full.T.astype(de_ref.dtype)


def _bwd_pallas(emb2d, wr, g, cfg: ModelConfig, bt: int, interpret: bool,
                glin=None, fm: bool = False):
    """emb2d follows _fwd_pallas' contract (incl. the fm tuple form:
    split operands get SPLIT dE outputs — a tuple in the same field
    partition, no HBM concat/slice on either side)."""
    f = cfg.num_fields
    fm_parts = None
    if fm and isinstance(emb2d, (tuple, list)):
        parts = tuple(emb2d)
        fm_parts = tuple(int(p.shape[0]) for p in parts)
        assert sum(fm_parts) == f
        _, b, w_phys = parts[0].shape
    elif fm:
        parts = (emb2d,)
        _, b, w_phys = emb2d.shape
    else:
        parts = (emb2d,)
        b, fw = emb2d.shape
        w_phys = fw // f
    kc, p_pad = wr.shape
    k = cfg.conv_kernel
    c1 = kc // k
    d = cfg.embed_dim
    dtype = parts[0].dtype
    lin = glin is not None
    kernel = functools.partial(_bwd_kernel, cfg=cfg, p_pad=p_pad, bt=bt,
                               c1=c1, w_phys=w_phys, lin=lin, fm=fm,
                               fm_parts=fm_parts)
    e_specs = _e_specs(parts, fm, bt, w_phys, f)
    in_specs = e_specs + [
        pl.BlockSpec((kc, p_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, c1 * d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    in_arrays = list(parts) + [wr, g]
    if lin:
        in_specs.append(pl.BlockSpec((8, bt), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        in_arrays.append(jnp.broadcast_to(
            glin.astype(jnp.float32)[None, :], (8, b)))
    de_shapes = ([jax.ShapeDtypeStruct(p.shape, dtype) for p in parts]
                 if fm else [jax.ShapeDtypeStruct((b, f * w_phys), dtype)])
    outs = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=e_specs + [
            # one dW partial per batch tile; summed outside
            pl.BlockSpec((1, k, p_pad, c1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=de_shapes + [
            jax.ShapeDtypeStruct((b // bt, k, p_pad, c1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d + 2 * (k // 2), p_pad, bt), dtype),  # M2T halo
            pltpu.VMEM((d + 2 * (k // 2), c1, bt), dtype),     # gp halo
        ] + ([pltpu.VMEM((f, w_phys, bt), dtype)]              # dE assembly
             if cfg.cross == "field_aware" else []),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*in_arrays)
    dw = jnp.sum(outs[-1], axis=0)
    if fm_parts:
        return tuple(outs[:-1]), dw
    return outs[0], dw


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _pick_bt(b: int, dtype, cfg: ModelConfig, bwd: bool = False,
             w_phys: int | None = None) -> int:
    """Largest batch tile dividing B that keeps VMEM within budget.

    Measured on v5e (F=39, d=16, C1=64, bf16): fwd throughput rises to
    bt=512 (4.1M ex/s); bwd needs more scratch and compiles/runs best
    at bt=128 (1.33M ex/s fwd+bwd).
    """
    itemsize = jnp.dtype(dtype).itemsize
    w = cfg.row_width if w_phys is None else w_phys
    d = cfg.embed_dim
    p_pad = _round_up(cfg.num_pairs, 8)
    if bwd:
        # bwd holds: input block + et transpose + M2T scratch, the
        # a_m2/gws/dm dot operand values (~2 p_pad*d copies), gp halo,
        # and the de output block; the dE slice-write scratch (the 4th
        # F*w copy) exists only on the field_aware path (mirrors the
        # scratch_shapes conditional in _bwd_pallas).
        fw_copies = 4 if cfg.cross == "field_aware" else 3
        per_lane = (fw_copies * cfg.num_fields * w + 3 * p_pad * d) * itemsize
    else:
        # fwd holds only: input block, its et transpose, the M2T
        # scratch (d+2 halo rows), and the (C1*d) output — the old
        # shared formula triple-counted scratch the fwd doesn't have
        # and demoted the full-rows path (w_phys=640) to bt=128.
        c1 = cfg.conv_channels[0] if cfg.conv_channels else d
        per_lane = (2 * cfg.num_fields * w
                    + (d + 2 * (cfg.conv_kernel // 2)) * p_pad
                    + c1 * d) * itemsize
    budget = 48 * 1024 * 1024
    bt = 128 if bwd else 512
    while bt > 8 and (bt * per_lane > budget or b % bt != 0):
        bt //= 2
    return max(bt, 8)


def _prep_w_fwd(w1: jax.Array, cfg: ModelConfig, p_pad: int, dtype) -> jax.Array:
    """(C1, P, k) -> banded stacked, transposed ((k+1)*P_pad, 2*C1).

    w2[0] = [W_0 .. W_{k-1}, 0]; w2[1] = [0, W_0 .. W_{k-1}] along the
    tap-window axis, so one matmul yields outputs x and x+1. The final
    transpose puts the contraction on SUBLANES (see _fwd_kernel).
    """
    c1, p, k = w1.shape
    wt = jnp.swapaxes(w1, 1, 2).astype(dtype)  # (C1, k, P)
    if p_pad > p:
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, p_pad - p)))
    zero = jnp.zeros((c1, 1, p_pad), dtype)
    top = jnp.concatenate([wt, zero], axis=1)      # (C1, k+1, P_pad)
    bottom = jnp.concatenate([zero, wt], axis=1)   # (C1, k+1, P_pad)
    w2 = jnp.concatenate([top, bottom], axis=0)    # (2*C1, k+1, P_pad)
    return w2.reshape(2 * c1, (k + 1) * p_pad).T


def _prep_w_bwd(w1: jax.Array, cfg: ModelConfig, p_pad: int, dtype) -> jax.Array:
    """(C1, P, k) -> tap-reversed (k*C1, P_pad) for the sublane-
    contracting dM dot (WRS^T GW2; see _bwd_kernel)."""
    c1, p, k = w1.shape
    wr = jnp.transpose(w1[:, :, ::-1], (1, 2, 0)).astype(dtype)  # (P, k, C1)
    if p_pad > p:
        wr = jnp.pad(wr, ((0, p_pad - p), (0, 0), (0, 0)))
    return wr.reshape(p_pad, k * c1).T


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cross_conv1_pallas(emb: jax.Array, w1: jax.Array, cfg: ModelConfig,
                       bt: int = 0, interpret: bool | None = None) -> jax.Array:
    y, _ = _cross_conv1_fwd(emb, w1, cfg, bt, interpret)
    return y


def _flatten_emb(emb: jax.Array, cfg: ModelConfig) -> jax.Array:
    b = emb.shape[0]
    return emb.reshape(b, cfg.num_fields * cfg.row_width)


def _cross_conv1_fwd(emb, w1, cfg, bt, interpret):
    assert cfg.embed_dim % 2 == 0, "fused kernel requires even embed_dim"
    # M2T/gp halos are k//2 rows each side and the tap window is k+1
    # rows, so every ODD k works (even k has no symmetric SAME halo;
    # make_interaction_fn routes those to the reference path).
    assert cfg.conv_kernel % 2 == 1, "fused kernel supports odd k only"
    if interpret is None:
        interpret = _auto_interpret()
    emb2d = _flatten_emb(emb, cfg)
    b = emb2d.shape[0]
    if bt == 0:
        bt = _pick_bt(b, emb2d.dtype, cfg)
    p_pad = _round_up(cfg.num_pairs, 8)
    w2 = _prep_w_fwd(w1, cfg, p_pad, emb2d.dtype)
    y2 = _fwd_pallas(emb2d, w2, cfg, bt, interpret)  # (B, C1*d)
    c1 = w1.shape[0]
    y = y2.reshape(b, c1, cfg.embed_dim)
    return y, (emb, w1)


def _cross_conv1_bwd(cfg, bt, interpret, res, gy):
    emb, w1 = res
    if interpret is None:
        interpret = _auto_interpret()
    emb2d = _flatten_emb(emb, cfg)
    b = emb2d.shape[0]
    if bt == 0:
        bt = _pick_bt(b, emb2d.dtype, cfg, bwd=True)
    p_pad = _round_up(cfg.num_pairs, 8)
    wr = _prep_w_bwd(w1, cfg, p_pad, emb2d.dtype)
    c1, p, k = w1.shape
    g2 = gy.reshape(b, c1 * cfg.embed_dim).astype(emb2d.dtype)
    de2, dwp = _bwd_pallas(emb2d, wr, g2, cfg, bt, interpret)
    de = de2.reshape(emb.shape).astype(emb.dtype)
    # (k, P_pad, C1) -> (C1, P, k)
    dw = jnp.transpose(dwp[:, :p, :], (2, 1, 0)).astype(w1.dtype)
    return de, dw


cross_conv1_pallas.defvjp(_cross_conv1_fwd, _cross_conv1_bwd)


# ---------------------------------------------------------------------------
# Full-rows variant: consume raw physical table rows, emit full-width
# grads with the fused first-order column handled in-kernel.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cross_conv1_lin_pallas(emb2d: jax.Array, w1: jax.Array, cfg: ModelConfig,
                           bt: int = 0, interpret: bool | None = None):
    """Fused cross+conv1 + first-order sum on FULL physical rows.

    emb2d: (B, F*table_width) — the lookup gather's output, reshaped for
    free (row-major both ways). Returns (y (B, C1, d), lin (B,) f32)
    where lin[b] = sum_f emb2d[b, f*table_width + row_width].

    Why this exists: the sliced path (cross_conv1_pallas) forces XLA to
    materialize the [..., :row_width] slice, a (B, F, row_width) layout
    copy of it, the kernel-operand re-layout, and on the way back a
    zero-pad + first-order-grad add + two more layout copies — ~25 ms
    of pure data formatting per step at criteo bench shapes (traced).
    Field slicing is free INSIDE the kernel (static VMEM slices), so
    this variant takes the raw rows and hands back full-width grads
    that feed the sparse update with zero intervening copies.
    """
    (y, lin), _ = _cross_conv1_lin_fwd(emb2d, w1, cfg, bt, interpret)
    return y, lin


def _cross_conv1_lin_fwd(emb2d, w1, cfg, bt, interpret):
    assert cfg.cross == "field_aware" and cfg.fused_linear
    assert cfg.embed_dim % 2 == 0 and cfg.conv_kernel % 2 == 1
    if interpret is None:
        interpret = _auto_interpret()
    b, fw = emb2d.shape
    assert fw == cfg.num_fields * cfg.table_width
    if bt == 0:
        bt = _pick_bt(b, emb2d.dtype, cfg, w_phys=cfg.table_width)
    p_pad = _round_up(cfg.num_pairs, 8)
    w2 = _prep_w_fwd(w1, cfg, p_pad, emb2d.dtype)
    y2, lin8 = _fwd_pallas(emb2d, w2, cfg, bt, interpret, lin=True)
    c1 = w1.shape[0]
    y = y2.reshape(b, c1, cfg.embed_dim)
    return (y, lin8[0]), (emb2d, w1)


def _cross_conv1_lin_bwd(cfg, bt, interpret, res, gys):
    emb2d, w1 = res
    gy, glin = gys
    if interpret is None:
        interpret = _auto_interpret()
    b = emb2d.shape[0]
    if bt == 0:
        bt = _pick_bt(b, emb2d.dtype, cfg, bwd=True, w_phys=cfg.table_width)
    p_pad = _round_up(cfg.num_pairs, 8)
    wr = _prep_w_bwd(w1, cfg, p_pad, emb2d.dtype)
    c1, p, k = w1.shape
    g2 = gy.reshape(b, c1 * cfg.embed_dim).astype(emb2d.dtype)
    de2, dwp = _bwd_pallas(emb2d, wr, g2, cfg, bt, interpret, glin=glin)
    dw = jnp.transpose(dwp[:, :p, :], (2, 1, 0)).astype(w1.dtype)
    return de2.astype(emb2d.dtype), dw


cross_conv1_lin_pallas.defvjp(_cross_conv1_lin_fwd, _cross_conv1_lin_bwd)


# ---------------------------------------------------------------------------
# Field-major full-rows variant: emb arrives (F, B, table_width), the raw
# physical layout of a gather with TRANSPOSED ids ((F*B, W) row tiles;
# the (F, B, W) view is a free bitcast when B % 8 == 0). Grads come back
# in the same layout and feed the field-major per-field sort with zero
# intervening copies — this kills BOTH ~10 ms/step retiling reshapes
# ((B*F,W)->(B,F*W) in and (B,F*W)->(B*F,W) out) that bracketed the
# batch-major full-rows kernel at criteo bench shapes (traced 2026-08-20).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cross_conv1_lin_fm_pallas(emb3: jax.Array, w1: jax.Array,
                              cfg: ModelConfig, bt: int = 0,
                              interpret: bool | None = None):
    """Fused cross+conv1 + first-order sum on field-major full rows.

    emb3: (F, B, table_width). Returns (y (B, C1, d), lin (B,) f32);
    the custom VJP's dE is (F, B, table_width), same layout in as out.
    """
    (y, lin), _ = _cross_conv1_lin_fm_fwd(emb3, w1, cfg, bt, interpret)
    return y, lin


def _cross_conv1_lin_fm_fwd(emb3, w1, cfg, bt, interpret):
    assert cfg.cross == "field_aware" and cfg.fused_linear
    assert cfg.embed_dim % 2 == 0 and cfg.conv_kernel % 2 == 1
    if interpret is None:
        interpret = _auto_interpret()
    f, b, w_phys = emb3.shape
    assert f == cfg.num_fields and w_phys == cfg.table_width
    if bt == 0:
        bt = _pick_bt(b, emb3.dtype, cfg, w_phys=cfg.table_width)
    p_pad = _round_up(cfg.num_pairs, 8)
    w2 = _prep_w_fwd(w1, cfg, p_pad, emb3.dtype)
    y2, lin8 = _fwd_pallas(emb3, w2, cfg, bt, interpret, lin=True, fm=True)
    c1 = w1.shape[0]
    y = y2.reshape(b, c1, cfg.embed_dim)
    return (y, lin8[0]), (emb3, w1)


def _cross_conv1_lin_fm_bwd(cfg, bt, interpret, res, gys):
    emb3, w1 = res
    gy, glin = gys
    if interpret is None:
        interpret = _auto_interpret()
    b = emb3.shape[1]
    if bt == 0:
        bt = _pick_bt(b, emb3.dtype, cfg, bwd=True, w_phys=cfg.table_width)
    p_pad = _round_up(cfg.num_pairs, 8)
    wr = _prep_w_bwd(w1, cfg, p_pad, emb3.dtype)
    c1, p, k = w1.shape
    g2 = gy.reshape(b, c1 * cfg.embed_dim).astype(emb3.dtype)
    de3, dwp = _bwd_pallas(emb3, wr, g2, cfg, bt, interpret, glin=glin,
                           fm=True)
    dw = jnp.transpose(dwp[:, :p, :], (2, 1, 0)).astype(w1.dtype)
    return de3.astype(emb3.dtype), dw


cross_conv1_lin_fm_pallas.defvjp(_cross_conv1_lin_fm_fwd,
                                 _cross_conv1_lin_fm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def cross_conv1_lin_fm2_pallas(e_small: jax.Array, e_big: jax.Array,
                               w1: jax.Array, cfg: ModelConfig, bt: int = 0,
                               interpret: bool | None = None):
    """Split-operand twin of cross_conv1_lin_fm_pallas for the hybrid
    small/big lookup (models.onehot_lookup_fm + gather): e_small
    (Fs, B, W) and e_big (Fb, B, W) with Fs + Fb = F are concatenated
    along fields IN VMEM per batch tile, and dE comes back as the same
    two parts — the HBM-level concat (fwd) + slice (bwd) this avoids
    measured 7.3 + 6.8 ms/step at criteo bench shapes (round 5)."""
    (y, lin), _ = _cc_fm2_fwd(e_small, e_big, w1, cfg, bt, interpret)
    return y, lin


def _cc_fm2_fwd(e_small, e_big, w1, cfg, bt, interpret):
    assert cfg.cross == "field_aware" and cfg.fused_linear
    assert cfg.embed_dim % 2 == 0 and cfg.conv_kernel % 2 == 1
    if interpret is None:
        interpret = _auto_interpret()
    b = e_small.shape[1]
    assert e_small.shape[0] + e_big.shape[0] == cfg.num_fields
    assert e_small.shape[2] == e_big.shape[2] == cfg.table_width
    if bt == 0:
        bt = _pick_bt(b, e_small.dtype, cfg, w_phys=cfg.table_width)
    p_pad = _round_up(cfg.num_pairs, 8)
    w2 = _prep_w_fwd(w1, cfg, p_pad, e_small.dtype)
    y2, lin8 = _fwd_pallas((e_small, e_big), w2, cfg, bt, interpret,
                           lin=True, fm=True)
    c1 = w1.shape[0]
    y = y2.reshape(b, c1, cfg.embed_dim)
    return (y, lin8[0]), (e_small, e_big, w1)


def _cc_fm2_bwd(cfg, bt, interpret, res, gys):
    e_small, e_big, w1 = res
    gy, glin = gys
    if interpret is None:
        interpret = _auto_interpret()
    b = e_small.shape[1]
    if bt == 0:
        bt = _pick_bt(b, e_small.dtype, cfg, bwd=True, w_phys=cfg.table_width)
    p_pad = _round_up(cfg.num_pairs, 8)
    wr = _prep_w_bwd(w1, cfg, p_pad, e_small.dtype)
    c1, p, k = w1.shape
    g2 = gy.reshape(b, c1 * cfg.embed_dim).astype(e_small.dtype)
    (de_s, de_b), dwp = _bwd_pallas((e_small, e_big), wr, g2, cfg, bt,
                                    interpret, glin=glin, fm=True)
    dw = jnp.transpose(dwp[:, :p, :], (2, 1, 0)).astype(w1.dtype)
    return de_s.astype(e_small.dtype), de_b.astype(e_big.dtype), dw


cross_conv1_lin_fm2_pallas.defvjp(_cc_fm2_fwd, _cc_fm2_bwd)


# ---------------------------------------------------------------------------
# Drop-in interaction_fn for the model
# ---------------------------------------------------------------------------


def _conv_tail(x, conv_params, cfg: ModelConfig):
    """bias/ReLU/pool + remaining (cheap) conv layers, in XLA."""
    layer1 = conv_params[0]
    x = x + layer1["b"].astype(x.dtype)[None, :, None]
    x = jax.nn.relu(x)
    if cfg.conv_pool > 1:
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, cfg.conv_pool),
            window_strides=(1, 1, cfg.conv_pool), padding="VALID",
        )
    rest = list(conv_params[1:])
    if rest:
        return conv_core_reference(x, rest, cfg)
    return x.reshape(x.shape[0], -1)


def make_interaction_fn(use_pallas: bool = True, bt: int = 0,
                        interpret: bool | None = None):
    """Returns interaction_fn(emb, conv_params, cfg) -> flat features.

    Layer 1 runs in the fused Pallas kernel (cross build + conv);
    bias/ReLU/pool and the remaining (cheap) conv layers run in XLA.
    When use_pallas, the returned fn also carries a `.full_rows(emb2d,
    conv_params, cfg) -> (feats, lin_sum)` attribute taking raw
    physical table rows (see cross_conv1_lin_pallas); the model routes
    through it when the config qualifies.
    """

    def interaction_fn(emb, conv_params, cfg: ModelConfig):
        if not conv_params:
            m = build_cross_map(emb, cfg)
            return m.reshape(m.shape[0], -1)
        layer1 = conv_params[0]
        if (use_pallas and cfg.conv_kernel % 2 == 1
                and cfg.embed_dim % 2 == 0):
            x = cross_conv1_pallas(emb, layer1["w"], cfg, bt, interpret)
        else:
            x = cross_conv1_reference(emb, layer1["w"], cfg)
        return _conv_tail(x, conv_params, cfg)

    if use_pallas:
        def full_rows(emb2d, conv_params, cfg: ModelConfig):
            layer1 = conv_params[0]
            y, lin_sum = cross_conv1_lin_pallas(emb2d, layer1["w"], cfg,
                                                bt, interpret)
            return _conv_tail(y, conv_params, cfg), lin_sum

        interaction_fn.full_rows = full_rows

        def full_rows_fm(emb3, conv_params, cfg: ModelConfig):
            layer1 = conv_params[0]
            y, lin_sum = cross_conv1_lin_fm_pallas(emb3, layer1["w"], cfg,
                                                   bt, interpret)
            return _conv_tail(y, conv_params, cfg), lin_sum

        interaction_fn.full_rows_fm = full_rows_fm

        def full_rows_fm2(e_small, e_big, conv_params, cfg: ModelConfig):
            layer1 = conv_params[0]
            y, lin_sum = cross_conv1_lin_fm2_pallas(
                e_small, e_big, layer1["w"], cfg, bt, interpret)
            return _conv_tail(y, conv_params, cfg), lin_sum

        interaction_fn.full_rows_fm2 = full_rows_fm2

    return interaction_fn
