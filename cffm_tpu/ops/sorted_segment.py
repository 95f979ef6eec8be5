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
    exactly Pallas' revisiting/accumulation pattern.
  - An input block's segments span < 2*EB output slots, so entries
    either hit the current output block (one-hot o1) or the NEXT one
    (o2); the o2 part accumulates in a carry scratch that is flushed
    when the grid reaches that block.
  - After the real blocks, synthetic "sweep" blocks (zero gradients,
    seg walking +EB per block) visit every remaining output block so
    the whole output is initialized — unvisited Pallas output blocks
    would otherwise hold garbage (NaN poison risk downstream).
  - uids ride along as 4 extra bf16 columns: component c of (id+1) in
    base-256 (each < 2^8, bf16-exact), masked to the segment's FIRST
    entry, so the same one-hot matmul deposits them at the compact
    slot. Decoded outside; empty slots decode to -1.

Output gsum is f32 (revisit accumulation stays exact for hot rows that
span hundreds of input blocks); the streamed-update kernel casts to
bf16 at its own boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 128
AUG = 128  # id-component columns, padded to one 128-lane block
NCOMP = 4  # base-256 components: ids up to 2^32


def _auto_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def _kernel(ob_ref, seg_ref, g_ref, out_ref, carry):
    i = pl.program_id(0)
    ob = ob_ref[i]
    prev = ob_ref[jnp.maximum(i - 1, 0)]
    is_first_visit = (i == 0) | (ob != prev)
    flush = (i > 0) & (ob == prev + 1)
    keep = (i > 0) & (ob == prev)

    seg_blk = seg_ref[pl.ds(i, 1), :]  # (1, EB) int32
    local = seg_blk - ob * EB          # in [0, 2*EB)
    g = g_ref[...]                     # (EB, W+AUG) bf16
    iota = jax.lax.broadcasted_iota(jnp.int32, (EB, EB), 0)
    o1 = (local == iota).astype(jnp.bfloat16)
    o2 = ((local - EB) == iota).astype(jnp.bfloat16)
    c1 = jax.lax.dot_general(o1, g, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    c2 = jax.lax.dot_general(o2, g, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(is_first_visit)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(flush)
    def _():
        out_ref[...] = out_ref[...] + carry[...]

    out_ref[...] = out_ref[...] + c1
    carry[...] = jnp.where(keep, carry[...], 0.0) + c2


def sorted_segment_sum_compact(
    sid: jax.Array,
    grads: jax.Array,
    m_pad: int,
    interpret: bool | None = None,
):
    """sid (n,) int32 SORTED ascending; grads (n, W) same order, W a
    multiple of 128. m_pad: static output slots (multiple of EB), must
    bound the segment count. Returns (uids (m_pad,) int32 with -1 in
    empty slots, gsum (m_pad, W) f32, count (scalar int32)).
    """
    if interpret is None:
        interpret = _auto_interpret()
    n, w = grads.shape
    assert w % 128 == 0 and m_pad % EB == 0
    g_real = -(-n // EB)
    n_pad = g_real * EB
    m_blocks = m_pad // EB

    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sid[1:] != sid[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(is_first) - 1
    count = seg[-1] + 1

    # base-256 id components, masked to first occurrences (bf16-exact)
    enc = (sid + 1).astype(jnp.uint32)
    comps = jnp.stack(
        [((enc >> (8 * c)) & 0xFF).astype(jnp.float32) for c in range(NCOMP)],
        axis=1) * is_first[:, None].astype(jnp.float32)  # (n, NCOMP)

    # augmented gradient block: [grads | comps | 0-pad], one extra
    # all-zero block at the end serves every synthetic sweep step
    g_aug = jnp.zeros((n_pad + EB, w + AUG), jnp.bfloat16)
    g_aug = g_aug.at[:n, :w].set(grads.astype(jnp.bfloat16))
    g_aug = g_aug.at[:n, w : w + NCOMP].set(comps.astype(jnp.bfloat16))

    # segments per block: real blocks from seg (pad rows repeat the last
    # value => no new segments); sweep blocks walk +EB per block from
    # seg_last so every output block gets visited (advance <= +1).
    seg_pad = jnp.concatenate(
        [seg, jnp.broadcast_to(seg[-1], (n_pad - n,))]).reshape(g_real, EB)
    sweep = jnp.minimum(
        seg[-1] + jnp.arange(m_blocks, dtype=jnp.int32) * EB,
        (m_blocks - 1) * EB)
    seg2d = jnp.concatenate(
        [seg_pad, jnp.broadcast_to(sweep[:, None], (m_blocks, EB))])
    g_total = g_real + m_blocks
    ob = (seg2d[:, 0] // EB).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_total,),
        in_specs=[
            pl.BlockSpec((g_total, EB), lambda i, ob_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, w + AUG),
                         lambda i, ob_ref: (jnp.minimum(i, g_real), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, w + AUG), lambda i, ob_ref: (ob_ref[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((EB, w + AUG), jnp.float32)],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, w + AUG), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ob, seg2d, g_aug)

    gsum = out[:, :w]
    c = out[:, w : w + NCOMP].astype(jnp.int32)
    uids = (c[:, 0] + (c[:, 1] << 8) + (c[:, 2] << 16) + (c[:, 3] << 24)) - 1
    return uids, gsum, count
