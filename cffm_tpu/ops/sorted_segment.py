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
  - uids ride along in a SEPARATE narrow operand pair: component c of
    (id+1) in base-256 (each < 2^8, bf16-exact), masked to the
    segment's FIRST entry, deposited by the same one-hot matmuls into
    a (m_pad, 128) bf16 rider output. Decoded outside; empty slots
    decode to -1. Keeping riders out of the gradient operand avoids
    materializing an augmented copy of the (n, W) gradient block —
    the n*(W+128) concat build cost ~7 GB of HBM traffic at criteo
    bench shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 128
AUG = 128  # rider lane block (NCOMP used, rest zero-pad)
NCOMP = 4  # base-256 components: ids up to 2^32


def _auto_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def _kernel(ob_ref, seg_ref, g_ref, c_ref, gout_ref, uout_ref,
            acc, accu, carry, carryu, *, g_real: int):
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
    # their g/c index maps are clamped to the last real block, so the
    # guard also keeps clamped garbage out of the sums).
    @pl.when(real)
    def _():
        seg_blk = seg_ref[pl.ds(i, 1), :]  # (1, EB) int32
        local = seg_blk - ob * EB          # in [0, 2*EB)
        g = g_ref[...]                     # (EB, W) bf16
        c = c_ref[...]                     # (EB, AUG) bf16
        iota = jax.lax.broadcasted_iota(jnp.int32, (EB, EB), 0)
        o1 = (local == iota).astype(jnp.bfloat16)
        o2 = ((local - EB) == iota).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        acc[...] = acc[...] + jax.lax.dot_general(
            o1, g, dims, preferred_element_type=jnp.float32)
        accu[...] = accu[...] + jax.lax.dot_general(
            o1, c, dims, preferred_element_type=jnp.float32)
        carry[...] = carry[...] + jax.lax.dot_general(
            o2, g, dims, preferred_element_type=jnp.float32)
        carryu[...] = carryu[...] + jax.lax.dot_general(
            o2, c, dims, preferred_element_type=jnp.float32)

    # Write-once flush: the HBM block leaves VMEM only after the last
    # visit, fully assigned.
    @pl.when(is_last)
    def _():
        gout_ref[...] = acc[...].astype(gout_ref.dtype)
        uout_ref[...] = accu[...].astype(uout_ref.dtype)


def sorted_segment_sum_compact(
    sid: jax.Array,
    grads: jax.Array,
    m_pad: int,
    interpret: bool | None = None,
):
    """sid (n,) int32 SORTED ascending; grads (n, W) same order, W a
    multiple of 128. m_pad: static output slots (multiple of EB), must
    bound the segment count. Returns (uids (m_pad,) int32 with -1 in
    empty slots, gsum (m_pad, W) bf16, count (scalar int32)).
    """
    if interpret is None:
        interpret = _auto_interpret()
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

    # base-256 id components, masked to first occurrences (bf16-exact)
    enc = ((sid + 1).astype(jnp.uint32) * is_first.astype(jnp.uint32))
    comps = jnp.stack(
        [((enc >> (8 * c)) & 0xFF).astype(jnp.bfloat16)
         for c in range(NCOMP)], axis=1)
    comps = jnp.pad(comps, ((0, 0), (0, AUG - NCOMP)))

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
            pl.BlockSpec((EB, w),
                         lambda i, ob_ref: (jnp.minimum(i, g_real - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, AUG),
                         lambda i, ob_ref: (jnp.minimum(i, g_real - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((EB, w), lambda i, ob_ref: (ob_ref[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, AUG), lambda i, ob_ref: (ob_ref[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((EB, w), jnp.float32),
                        pltpu.VMEM((EB, AUG), jnp.float32),
                        pltpu.VMEM((EB, w), jnp.float32),
                        pltpu.VMEM((EB, AUG), jnp.float32)],
    )
    gsum, uout = pl.pallas_call(
        functools.partial(_kernel, g_real=g_real),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_pad, w), jnp.bfloat16),
                   jax.ShapeDtypeStruct((m_pad, AUG), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ob, seg2d, grads, comps)

    c = uout[:, :NCOMP].astype(jnp.int32)
    uids = (c[:, 0] + (c[:, 1] << 8) + (c[:, 2] << 16) + (c[:, 3] << 24)) - 1
    return uids, gsum, count


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
