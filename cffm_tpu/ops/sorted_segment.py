"""Fused sorted-segment dedup kernel: sorted (ids, grads) -> compact
(uids, summed grads) in ONE streaming pass.

Why: the XLA lowering of the dedup reduction (`jax.ops.segment_sum` +
`segment_max` in optim.rowwise._dedup_sum) is scatter-based and
slot-latency-bound — measured ~45 ms for 1.28M sorted rows at W=640 on
v5e, dominating the sparse-update path. Sorted segments need no
scatter: this kernel walks the sorted stream once and writes segment
totals at their COMPACT output slot (slot k = segment k), using one
one-hot MXU matmul per 128-entry block.

Key construction (all shapes static):
  - seg[p] = running segment index (cumsum of id-change flags, computed
    outside — cumsum is ~free on TPU, the scatters were the problem).
  - Output block of input block i: ob[i] = seg[i*EB] // EB. Since seg
    advances by <= 1 per entry, ob is non-decreasing and advances by
    <= 1 per block, so output blocks are visited in consecutive runs —
    exactly Pallas' revisiting pattern.
  - An input block's segments span < 2*EB output slots, so entries
    either hit the current output block (one-hot o1) or the NEXT one
    (o2); the o2 part accumulates in a carry scratch that the next
    output block's first visit consumes.
  - Accumulation happens in f32 VMEM scratch; the HBM output block is
    written ONCE, at the block's last visit, in bf16 — revisit
    accumulation stays exact for hot rows spanning hundreds of input
    blocks, and output traffic is half of an f32 out. (The sole
    consumer, ops.streamed_update, wants bf16 anyway — this also
    deletes its separate cast pass.)
  - After the real blocks, synthetic "sweep" blocks (compute-skipped,
    seg walking +EB per block) visit every remaining output block so
    the whole output is initialized — unvisited Pallas output blocks
    would otherwise hold garbage (NaN poison risk downstream).
  - uids ride along as a VMEM-RESIDENT int32 operand enc2d (g_real,
    EB): enc[p] = (sid[p]+1) masked to the segment's FIRST entry
    (non-first entries are 0). In-kernel, each block deposits enc at
    the compact slot with an f32 lane-broadcast multiply + lane-sum
    against the same one-hot — exact because first-entry masking
    leaves at most ONE nonzero term per slot and (when the caller's
    max_id bound fits 24 bits, every real config) the value itself is
    f32-exact; bigger id spaces split into two 16-bit halves (each
    < 2^16, f32-exact). The flush writes DECODED int32 uids to a
    (m_pad, 1) output; empty slots decode to -1. This replaced a
    (n, 128) bf16 rider-operand + decode-outside scheme whose
    pad/stack/slice/convert ops cost ~9.6 ms/step at criteo bench
    shapes (traced 2026-08-20); the resident enc2d is ~10 MB VMEM
    (same residency pattern as seg2d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 128


def _auto_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def _kernel(ob_ref, seg_ref, enc_ref, g_ref, gout_ref, uout_ref,
            acc, accu, carry, carryu, *, g_real: int, wide_ids: bool):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    ob = ob_ref[i]
    prev = ob_ref[jnp.maximum(i - 1, 0)]
    nxt = ob_ref[jnp.minimum(i + 1, nsteps - 1)]
    is_first = (i == 0) | (ob != prev)
    from_carry = (i > 0) & (ob == prev + 1)
    is_last = (i == nsteps - 1) | (nxt != ob)
    real = i < g_real

    # First visit of this output block: seed from the straddle carry
    # (consumed exactly once: ob advances by <= 1), then reset it.
    @pl.when(is_first & from_carry)
    def _():
        acc[...] = carry[...]
        accu[...] = carryu[...]

    @pl.when(is_first & jnp.logical_not(from_carry))
    def _():
        acc[...] = jnp.zeros_like(acc)
        accu[...] = jnp.zeros_like(accu)

    @pl.when(is_first)
    def _():
        carry[...] = jnp.zeros_like(carry)
        carryu[...] = jnp.zeros_like(carryu)

    # Deposit this input block's entries (sweep blocks deposit nothing;
    # their g index maps are clamped to the last real block, so the
    # guard also keeps clamped garbage out of the sums).
    @pl.when(real)
    def _():
        seg_blk = seg_ref[pl.ds(i, 1), :]  # (1, EB) int32
        local = seg_blk - ob * EB          # in [0, 2*EB)
        g = g_ref[...]                     # (EB, W) bf16
        iota = jax.lax.broadcasted_iota(jnp.int32, (EB, EB), 0)
        o1 = (local == iota).astype(jnp.bfloat16)
        o2 = ((local - EB) == iota).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        acc[...] = acc[...] + jax.lax.dot_general(
            o1, g, dims, preferred_element_type=jnp.float32)
        carry[...] = carry[...] + jax.lax.dot_general(
            o2, g, dims, preferred_element_type=jnp.float32)
        # id deposit: byte c of enc (masked to first entries, so each
        # slot sees at most ONE nonzero product -> bf16-exact) lands in
        # f32 column c via lane-broadcast multiply + lane reduction.
        enc_blk = enc_ref[pl.ds(i, 1), :]  # (1, EB) int32, 0 off-first
        # enc deposits into f32 lane(s) of the full-width scratch via a
        # lane mask — narrow (EB, NCOMP) concat/scratch miscompiled
        # under Mosaic (ids >= 2^16 silently lost their high parts on
        # silicon while CPU interpret passed; caught by the on-chip
        # corner-case parity sweep, scripts/check_onchip_parity.py)
        lane = jax.lax.broadcasted_iota(jnp.int32, (EB, EB), 1)
        comps = ([enc_blk & 0xFFFF, enc_blk >> 16] if wide_ids
                 else [enc_blk])
        o1f = o1.astype(jnp.float32)
        o2f = o2.astype(jnp.float32)
        u1 = accu[...]
        u2 = carryu[...]
        for c, comp in enumerate(comps):
            val = comp.astype(jnp.float32)  # exact: < 2^16 | < 2^24
            m = (lane == c).astype(jnp.float32)
            u1 = u1 + jnp.sum(o1f * val, axis=1, keepdims=True,
                              dtype=jnp.float32) * m
            u2 = u2 + jnp.sum(o2f * val, axis=1, keepdims=True,
                              dtype=jnp.float32) * m
        accu[...] = u1
        carryu[...] = u2

    # Write-once flush: the HBM block leaves VMEM only after the last
    # visit, fully assigned. uids decode in-kernel: two 16-bit halves
    # (each < 2^16, f32-exact) recombine to the int32 id; empty slots
    # (all-zero bytes) decode to -1.
    @pl.when(is_last)
    def _():
        gout_ref[...] = acc[...].astype(gout_ref.dtype)
        au = accu[...]
        if wide_ids:
            lo = au[:, 0:1].astype(jnp.int32)
            hi = au[:, 1:2].astype(jnp.int32)
            # hi * 65536, NOT hi << 16: Mosaic miscompiles the left
            # shift on (EB, 1) int32 values to 0 on silicon (repro'd in
            # isolation 2026-08-20; interpret mode is correct either
            # way — scripts/check_onchip_parity.py guards this)
            uout_ref[...] = lo + hi * 65536 - 1
        else:
            uout_ref[...] = au[:, 0:1].astype(jnp.int32) - 1


def sorted_segment_sum_compact(
    sid: jax.Array,
    grads: jax.Array,
    m_pad: int,
    interpret: bool | None = None,
    max_id: int | None = None,
):
    """sid (n,) int32 SORTED ascending; grads (n, W) same order, W a
    multiple of 128. m_pad: static output slots (multiple of EB), must
    bound the segment count. max_id: static upper bound on sid values
    (e.g. the table row count incl. the sentinel row); when it fits 24
    bits the id rider deposits as ONE exact f32 component instead of
    two 16-bit halves (half the deposit VPU work — measured ~2 ms/step
    at criteo bench shapes). Returns (uids (m_pad,) int32 with -1 in
    empty slots, gsum (m_pad, W) bf16, count (scalar int32)).
    """
    if interpret is None:
        interpret = _auto_interpret()
    wide_ids = max_id is None or (max_id + 2) >= (1 << 24)
    n, w = grads.shape
    assert w % 128 == 0 and m_pad % EB == 0
    grads = grads.astype(jnp.bfloat16)
    if n % EB:
        pad = EB - n % EB
        # pad ids repeat the last id => no new segments, zero grads
        sid = jnp.concatenate([sid, jnp.broadcast_to(sid[-1], (pad,))])
        grads = jnp.concatenate([grads, jnp.zeros((pad, w), grads.dtype)])
        n = n + pad
    g_real = n // EB
    m_blocks = m_pad // EB

    from cffm_tpu.ops.scan import cumsum_i32
    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sid[1:] != sid[:-1]).astype(jnp.int32)])
    seg = cumsum_i32(is_first)
    count = seg[-1]
    seg = seg - 1

    # (id+1) masked to first occurrences; byte-split happens in-kernel
    enc2d = ((sid + 1) * is_first).reshape(g_real, EB)

    # segments per block: real blocks from seg; sweep blocks walk +EB
    # per block from seg_last so every output block gets visited
    # (advance <= +1 per block either way).
    seg2d = seg.reshape(g_real, EB)
    sweep = jnp.minimum(
        seg[-1] + jnp.arange(m_blocks, dtype=jnp.int32) * EB,
        (m_blocks - 1) * EB)
    seg2d = jnp.concatenate(
        [seg2d, jnp.broadcast_to(sweep[:, None], (m_blocks, EB))])
    g_total = g_real + m_blocks
    ob = (seg2d[:, 0] // EB).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_total,),
        in_specs=[
            pl.BlockSpec((g_total, EB), lambda i, ob_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_real, EB), lambda i, ob_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, w),
                         lambda i, ob_ref: (jnp.minimum(i, g_real - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((EB, w), lambda i, ob_ref: (ob_ref[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, 1), lambda i, ob_ref: (ob_ref[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((EB, w), jnp.float32),
                        pltpu.VMEM((EB, EB), jnp.float32),
                        pltpu.VMEM((EB, w), jnp.float32),
                        pltpu.VMEM((EB, EB), jnp.float32)],
    )
    gsum, uout = pl.pallas_call(
        functools.partial(_kernel, g_real=g_real, wide_ids=wide_ids),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_pad, w), jnp.bfloat16),
                   jax.ShapeDtypeStruct((m_pad, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ob, seg2d, enc2d, grads)

    return uout[:, 0], gsum, count


def _kernel_seg(ob_ref, seg_ref, g_ref, gout_ref, acc, carry, *, g_real: int):
    """Rider-free twin of _kernel: segment sums only, no uid columns.
    Same carry/sweep protocol; see _kernel for the invariants."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    ob = ob_ref[i]
    prev = ob_ref[jnp.maximum(i - 1, 0)]
    nxt = ob_ref[jnp.minimum(i + 1, nsteps - 1)]
    is_first = (i == 0) | (ob != prev)
    from_carry = (i > 0) & (ob == prev + 1)
    is_last = (i == nsteps - 1) | (nxt != ob)
    real = i < g_real

    @pl.when(is_first & from_carry)
    def _():
        acc[...] = carry[...]

    @pl.when(is_first & jnp.logical_not(from_carry))
    def _():
        acc[...] = jnp.zeros_like(acc)

    @pl.when(is_first)
    def _():
        carry[...] = jnp.zeros_like(carry)

    @pl.when(real)
    def _():
        seg_blk = seg_ref[pl.ds(i, 1), :]
        local = seg_blk - ob * EB
        g = g_ref[...]
        iota = jax.lax.broadcasted_iota(jnp.int32, (EB, EB), 0)
        o1 = (local == iota).astype(jnp.bfloat16)
        o2 = ((local - EB) == iota).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        acc[...] = acc[...] + jax.lax.dot_general(
            o1, g, dims, preferred_element_type=jnp.float32)
        carry[...] = carry[...] + jax.lax.dot_general(
            o2, g, dims, preferred_element_type=jnp.float32)

    @pl.when(is_last)
    def _():
        gout_ref[...] = acc[...].astype(gout_ref.dtype)


def sorted_segment_sum_by_seg(
    seg: jax.Array,
    sorted_grads: jax.Array,
    m_pad: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Compact segment sums for an ALREADY-SEGMENTED sorted stream.

    seg (n,) int32: non-decreasing segment index starting at 0 and
    advancing by <= 1 (exactly build_routing's `seg`). sorted_grads
    (n, W) bf16 in the same order, W a multiple of 128. m_pad: static
    output slot count (multiple of EB) bounding the segment count.
    Returns gsum (m_pad, W) bf16 with segment k's f32-accumulated total
    at slot k (one bf16 rounding at flush, same class as
    sorted_segment_sum_compact).

    This is the dedup-sum of the sharded gradient-return path
    (parallel/sharded_embedding.grad_return): the XLA segment_sum it
    replaces materialized an (n, W) f32 buffer through a scatter-add —
    measured 80.9 ms at criteo bench shapes (n=2.56M, W=640) vs ~19 ms
    for this kernel (scripts/trace_sharded.py, 2026-08-20).
    """
    if interpret is None:
        interpret = _auto_interpret()
    n, w = sorted_grads.shape
    assert w % 128 == 0 and m_pad % EB == 0
    assert sorted_grads.dtype == jnp.bfloat16
    if n % EB:
        pad = EB - n % EB
        seg = jnp.concatenate([seg, jnp.broadcast_to(seg[-1], (pad,))])
        sorted_grads = jnp.concatenate(
            [sorted_grads, jnp.zeros((pad, w), sorted_grads.dtype)])
        n = n + pad
    g_real = n // EB
    m_blocks = m_pad // EB

    seg2d = seg.reshape(g_real, EB)
    sweep = jnp.minimum(
        seg[-1] + jnp.arange(m_blocks, dtype=jnp.int32) * EB,
        (m_blocks - 1) * EB)
    seg2d = jnp.concatenate(
        [seg2d, jnp.broadcast_to(sweep[:, None], (m_blocks, EB))])
    g_total = g_real + m_blocks
    ob = (seg2d[:, 0] // EB).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_total,),
        in_specs=[
            pl.BlockSpec((g_total, EB), lambda i, ob_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, w),
                         lambda i, ob_ref: (jnp.minimum(i, g_real - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((EB, w), lambda i, ob_ref: (ob_ref[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((EB, w), jnp.float32),
                        pltpu.VMEM((EB, w), jnp.float32)],
    )
    (gsum,) = pl.pallas_call(
        functools.partial(_kernel_seg, g_real=g_real),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_pad, w), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ob, seg2d, sorted_grads)
    return gsum
