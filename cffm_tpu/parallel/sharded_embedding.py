"""Row-sharded embedding engine: dedup + all-to-all lookup + grad return.

The centerpiece of the scaled configuration (SURVEY.md L2 / BASELINE
north_star: "tables row-sharded across a multi-host TPU pod with
all-to-all ID exchange, ID dedup, and fused lookup; gradients return
via the reverse all-to-all; optimizer state lives with the shards").

Sharding scheme: MOD-sharding — global id g lives on shard g % T at
local row g // T. Mod (not block) sharding spreads each field's hot
head rows across all shards (Zipf traffic balance); the cost is that
the *storage* global array is a permuted view of the logical table
(storage row = owner * rows_per_shard + local_row). Checkpoints
record T; resharding to a different T requires a repermute (documented
v1 limitation, see checkpoint.py).

Everything is static-shape for XLA (SURVEY.md §3.2): per-peer
fixed-capacity buckets with overflow counting, sort-based dedup
(jnp.unique is not jit-able), and `jax.lax.all_to_all` inside
`shard_map`. All functions here run INSIDE shard_map over the flat
device axis; per-device views.

The lookup is deliberately not autodiff'd through the table: the train
step takes grads w.r.t. the returned rows and calls `grad_return` +
`rowwise_update` — the reverse all-to-all routes dedup-summed row
grads back to their owner shard, where the per-row optimizer applies
them locally (no dense table-sized gradients ever exist).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp



class Routing(NamedTuple):
    """Static-shape routing residuals from a lookup, reused for the
    reverse (gradient) path and for same-batch secondary tables."""

    order: jax.Array        # (n,) argsort of flat ids (by storage-row key)
    seg: jax.Array          # (n,) segment id of each sorted position
    idx_of_pos: jax.Array   # (n,) exchange slot of each ORIGINAL position,
                            #      or -1 (capacity overflow)
    slot_k: jax.Array       # (n,) exchange slot owner*C+rank of unique id k,
                            #      or -1 (k >= n_unique / capacity overflow)
    recv_ids: jax.Array     # (T, C) local row ids this shard must serve
    recv_valid: jax.Array   # (T, C) bool mask of served slots
    overflow: jax.Array     # () int32: unique ids dropped (capacity overflow)


def _axis_size(axis: str) -> jax.Array:
    return jax.lax.axis_size(axis)


def build_routing(ids_flat: jax.Array, capacity: int, axis: str,
                  rows_per_shard: int | None = None,
                  max_unique: int | None = None) -> Routing:
    """Dedup + bucket-by-owner + all-to-all ID exchange. Per-shard view.

    ids_flat: (n,) int32 global ids of this shard's batch.
    capacity: per-peer bucket size C (static).
    rows_per_shard: the peers' local table row count Vs (v_pad // t).
    Optional — without it a conservative 2^31/t key stride is used —
    but passing it keeps the sort key dense.
    max_unique: optional static bound on the distinct-id count of
    ids_flat (optim.rowwise.unique_bound). When capacity provably
    covers it (no overflow possible), the send scatters keep the
    indices_are_sorted fast path; otherwise overflowed ks interleave
    out-of-bounds positions between ascending valid slots and the
    sorted hint would be a lie (implementation-defined results).

    ONE sort, not two: the key is the mod-sharded STORAGE row
    (owner * Vs + local_row — exactly to_mod_sharded's layout), so a
    single sort yields dedup adjacency (equal ids adjacent), owner
    grouping (owner-major), and ascending local rows within each owner
    (sequential gather locality on the serving shard). Bucket ranks
    then fall out of one searchsorted against the owner starts, and
    every downstream scatter has sorted unique indices.
    """
    n = ids_flat.shape[0]
    t = _axis_size(axis)
    stride = int(rows_per_shard) if rows_per_shard else ((1 << 31) // int(t))

    # ---- single sort by storage-row key ----
    key = (ids_flat % t) * stride + ids_flat // t
    pos = jnp.arange(n, dtype=jnp.int32)
    sk, order = jax.lax.sort_key_val(key, pos)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    seg = (jnp.cumsum(is_first) - 1).astype(jnp.int32)   # (n,) in [0, n)
    n_unique = seg[-1] + 1
    uk = jax.ops.segment_max(sk, seg, num_segments=n,
                             indices_are_sorted=True)    # unique keys, ascending
    k_valid = jnp.arange(n) < n_unique

    # ---- owner / local row / in-bucket rank (no second sort) ----
    owner = jnp.where(k_valid, uk // stride, t)          # invalid -> bucket t
    local_row = uk % stride
    start = jnp.searchsorted(owner, jnp.arange(t + 1))
    rank = (jnp.arange(n, dtype=jnp.int32)
            - start[jnp.clip(owner, 0, t)].astype(jnp.int32))

    in_cap = rank < capacity
    send_ok = k_valid & in_cap
    overflow = jnp.sum(k_valid & ~in_cap).astype(jnp.int32)

    # signed exchange slot per unique k: one int32 array serves the
    # lookup's position gather AND the grad return's scatter positions
    # (replaces the separate owner_k/rank_k/valid_k arrays — the old
    # bool valid_k cost a second 2.56M-wide gather in routed_lookup,
    # measured 20.6 ms at criteo bench shapes).
    slot_k = jnp.where(send_ok, owner * capacity + rank, -1).astype(jnp.int32)

    # ---- assemble send buffer of LOCAL row ids (T, C) ----
    # send positions owner*C + rank strictly increase over valid k ->
    # sorted unique scatter; invalid -> out of bounds, dropped.
    sorted_hint = capacity >= min(n, max_unique or n)
    send_pos = jnp.where(send_ok, owner * capacity + rank, t * capacity)
    send_buf = jnp.full((t * capacity,), -1, jnp.int32).at[send_pos].set(
        local_row.astype(jnp.int32), mode="drop", unique_indices=True,
        indices_are_sorted=sorted_hint).reshape(t, capacity)

    # ---- exchange: shard s receives the rows peers want from it ----
    recv_ids = jax.lax.all_to_all(send_buf, axis, 0, 0, tiled=False)
    recv_valid = recv_ids >= 0

    # exchange slot per ORIGINAL position, GATHER-FREE: the slot is
    # recomputed elementwise in sorted-position space (owner from the
    # sorted key, rank = seg minus the owner run's first seg via a
    # cummax forward-fill), then ONE int-pair sort inverts the
    # permutation. Every indexed formulation measured latency-bound at
    # criteo bench shapes: scatter+gather 22+18 ms, take(slot_k, seg)
    # 49.6 ms (XLA refused to materialize slot_k and recomputed the
    # searchsorted per element); this is elementwise + a ~5 ms sort.
    owner_pos = (sk // stride).astype(jnp.int32)
    run_first = jnp.concatenate(
        [jnp.ones((1,), bool), owner_pos[1:] != owner_pos[:-1]])
    seg_run_start = jax.lax.cummax(jnp.where(run_first, seg, 0))
    rank_pos = seg - seg_run_start
    slot_of_sorted = jnp.where(rank_pos < capacity,
                               owner_pos * capacity + rank_pos, -1)
    _, idx_of_pos = jax.lax.sort_key_val(order, slot_of_sorted)

    return Routing(
        order=order.astype(jnp.int32),
        seg=seg,
        idx_of_pos=idx_of_pos,
        slot_k=slot_k,
        recv_ids=recv_ids,
        recv_valid=recv_valid,
        overflow=overflow,
    )


def routed_lookup(table_local: jax.Array, routing: Routing, axis: str,
                  out_dtype=None, assume_no_overflow: bool = False) -> jax.Array:
    """Serve + exchange + gather-back. Returns (n, W) rows for the
    original flat positions (zeros for overflow ids).

    assume_no_overflow: pass True when capacity STATICALLY covers the
    shard's distinct-id bound (capacity >= min(n, unique_bound) — the
    same condition as build_routing's sorted-scatter hint), i.e. every
    idx_of_pos is provably >= 0. Skips the overflow mask: the full
    (n, W) select, its VJP select on the backward pass, and the pred
    broadcast layout copies measured ~43 ms/step at criteo bench
    shapes."""
    t, c = routing.recv_ids.shape
    w = table_local.shape[1]
    out_dtype = out_dtype or table_local.dtype

    # serve local rows to each requesting peer (recv_ids ascend within
    # each peer bucket -> near-sequential HBM gather). Unrequested
    # slots serve row 0's data UNMASKED: no consumer ever gathers them
    # (idx below only points at valid slots), and dropping the
    # where(recv_valid) select saved a full (n, W) pass (~10 ms at
    # criteo bench shapes).
    safe = jnp.maximum(routing.recv_ids, 0)
    served = jnp.take(table_local, safe.reshape(-1), axis=0,
                      mode="clip").reshape(t, c, w).astype(out_dtype)

    # reverse exchange: my requested rows come back
    got = jax.lax.all_to_all(served, axis, 0, 0, tiled=False).reshape(t * c, w)

    # ONE wide gather straight to original positions: position p's row
    # sits at its precomputed exchange slot; overflow slots (-1) clamp
    # to 0 and are masked to zero rows.
    idx = routing.idx_of_pos
    if assume_no_overflow:
        return jnp.take(got, idx, axis=0, mode="clip")
    rows = jnp.take(got, jnp.maximum(idx, 0), axis=0, mode="clip")
    return jnp.where((idx >= 0)[:, None], rows, 0)


def grad_return(drows_flat: jax.Array, routing: Routing, axis: str,
                max_unique: int | None = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Reverse path: dedup-sum grads per unique id and all-to-all them
    back to the owner shard.

    Returns (row_ids (T*C,), grads (T*C, W)) in the OWNER's local row
    space, sentinel -1 rows for empty slots (their grads are exact
    zeros) — the contract of optim.rowwise.rowwise_update, which may
    therefore be called with sentinel_grads_zero=True.

    max_unique: optional static bound on this shard's distinct-id count
    (e.g. optim.rowwise.unique_bound of the local batch); shrinks the
    compact dedup buffer and the scatter slot count.

    bf16 grads with a 128-multiple width take the fused Pallas
    sorted-segment kernel (compact slots, then ONE sorted-unique
    scatter into the exchange buckets) — the XLA segment_sum this
    replaces materialized an (n, W) f32 scatter-add, measured 80.9 ms
    vs ~19 ms at criteo bench shapes (scripts/trace_sharded.py). Other
    dtypes keep the exact-f32 segment_sum path (one bf16-class rounding
    either way for bf16; f32 payloads stay exact).
    """
    n, w = drows_flat.shape
    t, c = routing.recv_ids.shape

    dsorted = jnp.take(drows_flat, routing.order, axis=0, mode="clip")
    send_pos = jnp.where(routing.slot_k >= 0, routing.slot_k, t * c)
    # same no-overflow-possible condition as build_routing: with
    # overflow, dropped out-of-bounds positions interleave between
    # ascending valid slots and the sorted hint would be a lie.
    sorted_hint = c >= min(n, max_unique or n)

    if drows_flat.dtype == jnp.bfloat16 and w % 128 == 0:
        from cffm_tpu.ops.sorted_segment import EB, sorted_segment_sum_by_seg
        m = min(n, max_unique) if max_unique else n
        m_pad = -(-m // EB) * EB
        gsum = sorted_segment_sum_by_seg(routing.seg, dsorted, m_pad)
        # compact slot k -> exchange slot owner*C+rank: ascending over
        # valid k -> sorted unique scatter-SET. Compact slots past the
        # unique count carry send_pos t*c and drop.
        pos = (jnp.concatenate([send_pos,
                                jnp.full((m_pad - n,), t * c, jnp.int32)])
               if m_pad > n else send_pos[:m_pad])
        send = jnp.zeros((t * c, w), jnp.bfloat16).at[pos].set(
            gsum, mode="drop", unique_indices=True,
            indices_are_sorted=sorted_hint).reshape(t, c, w)
    else:
        guniq = jax.ops.segment_sum(dsorted.astype(jnp.float32), routing.seg,
                                    num_segments=n, indices_are_sorted=True)
        send = jnp.zeros((t * c, w), drows_flat.dtype).at[send_pos].set(
            guniq.astype(drows_flat.dtype), mode="drop", unique_indices=True,
            indices_are_sorted=sorted_hint).reshape(t, c, w)

    got = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)  # (T, C, W)
    row_ids = jnp.where(routing.recv_valid, routing.recv_ids, -1).reshape(-1)
    return row_ids, got.reshape(t * c, w)


# ---------------------------------------------------------------------------
# Convenience: capacity sizing
# ---------------------------------------------------------------------------


def pick_capacity(n_ids: int, num_shards: int, factor: float = 2.0,
                  rows_per_shard: int | None = None,
                  max_unique: int | None = None) -> int:
    """Per-peer bucket capacity: even split times slack, lane-rounded.

    Hard caps (always correct, no overflow possible beyond them):
    a shard can't request more distinct ids than it has ids (n_ids),
    a peer can't serve more distinct rows than it owns
    (rows_per_shard), and a shard can't request more distinct ids than
    the per-field vocab structure allows (max_unique =
    optim.rowwise.unique_bound: sum_f min(vocab_f, batch)). Without
    them, T=1 benches allocated send/serve buffers LARGER than the
    whole table (5.1M slots x 640 lanes = 6.5 GB of bf16 transients at
    criteo bench shapes); the max_unique cap further cut the t=1
    exchange buffers 2.56M -> 1.71M slots at criteo batch 65536."""
    base = -(-n_ids // num_shards)
    cap = int(base * factor)
    cap = min(cap, n_ids)
    if max_unique is not None:
        cap = min(cap, int(max_unique))
    if rows_per_shard is not None:
        cap = min(cap, rows_per_shard)
    return max(128, -(-cap // 128) * 128)


# ---------------------------------------------------------------------------
# Layout conversion (natural <-> mod-sharded storage) — used by tests,
# checkpoint import/export, and single-chip <-> sharded migration.
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def to_mod_sharded(table: jax.Array, t: int) -> jax.Array:
    """(V, W) natural -> (V_pad, W) permuted storage for t shards."""
    v, w = table.shape
    v_pad = _round_up(v, t)
    vs = v_pad // t
    full = jnp.concatenate([table, jnp.zeros((v_pad - v, w), table.dtype)], 0)
    g = jnp.arange(v_pad)
    dest = (g % t) * vs + g // t
    return jnp.zeros_like(full).at[dest].set(full)


def from_mod_sharded(storage: jax.Array, t: int, v: int) -> jax.Array:
    """(V_pad, W) permuted storage -> (V, W) natural."""
    v_pad, _ = storage.shape
    vs = v_pad // t
    g = jnp.arange(v_pad)
    dest = (g % t) * vs + g // t
    return storage[dest][:v]
