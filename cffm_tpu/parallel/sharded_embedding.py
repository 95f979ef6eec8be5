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

Routing layout (round-4 "slice routing" — scatter-free): ONE sort by
storage-row key yields the compact unique stream in (owner, local_row)
order. Owner o's slice of that stream [start[o], start[o]+count[o])
IS its exchange bucket — so both the ID send buffer and the gradient
send buffer are assembled with T static-size dynamic slices instead of
scatters into exchange-slot space (the slot scatters measured
5.9 + 9.2 ms/step at criteo bench shapes, scripts/trace_sharded.py
2026-08-20; the slices are ~free). Empty bucket slots carry the
OUT-OF-RANGE sentinel `rows_per_shard` (not -1) so each bucket stays
ascending — the contract the bucketed streamed update kernel's
searchsorted windows need (ops/streamed_update.py).

The lookup is deliberately not autodiff'd through the table: the train
step takes grads w.r.t. the returned rows and calls `grad_return` +
`bucketed_rowwise_update` — the reverse all-to-all routes dedup-summed
row grads back to their owner shard, where the per-row optimizer
applies them locally (no dense table-sized gradients ever exist).
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
    start: jax.Array        # (T+1,) compact-slot boundary of each owner:
                            #      unique k belongs to owner o iff
                            #      start[o] <= k < start[o+1]
    recv_ids: jax.Array     # (T, C) local row ids this shard must serve,
                            #      ascending per bucket; empty slots hold
                            #      the out-of-range sentinel (stride)
    recv_valid: jax.Array   # (T, C) bool mask of served slots
    sentinel: int           # static id sentinel (== stride); recv_ids
                            #      slots >= sentinel are empty
    overflow: jax.Array     # () int32: unique ids dropped (capacity overflow)


def _axis_size(axis: str) -> int:
    return jax.lax.axis_size(axis)


def build_routing(ids_flat: jax.Array, capacity: int, axis: str,
                  rows_per_shard: int | None = None,
                  max_unique: int | None = None,
                  keys: jax.Array | None = None) -> Routing:
    """Dedup + bucket-by-owner + all-to-all ID exchange. Per-shard view.

    ids_flat: (n,) int32 global ids of this shard's batch.
    capacity: per-peer bucket size C (static, 128-multiple).
    rows_per_shard: the peers' local table row count Vs (v_pad // t).
    Optional — without it a conservative 2^31/t key stride is used —
    but passing it keeps the sort key dense.
    max_unique: optional static bound on the distinct-id count of
    ids_flat (optim.rowwise.unique_bound); callers use it to size
    capacity and to enable the overflow-free fast paths downstream.
    keys: optional precomputed sort keys replacing the default
    mod-sharding formula. Must equal owner*stride + local with owner in
    [0, t] (owner == t marks sentinel/empty entries: they sort last,
    dedup into one segment past the last owner boundary, and are never
    bucketed) and local in [0, stride). rows_per_shard is REQUIRED with
    keys (it is the stride). The hierarchical exchange
    (parallel/hier_embedding.py) uses this for both of its stages.

    ONE sort, not two: the key is the mod-sharded STORAGE row
    (owner * Vs + local_row — exactly to_mod_sharded's layout), so a
    single sort yields dedup adjacency (equal ids adjacent), owner
    grouping (owner-major), and ascending local rows within each owner
    (sequential gather locality on the serving shard). Owner bucket
    boundaries in compact-unique space fall out of one tiny
    searchsorted over the sorted owners; all per-position quantities
    (bucket rank, exchange slot) are elementwise from there — no
    segment_max, no cummax scan, no slot scatters (the previous
    formulation's scan+scatter pipeline measured ~17 ms/step at criteo
    bench shapes, scripts/trace_sharded.py 2026-08-20).
    """
    n = ids_flat.shape[0]
    t = _axis_size(axis)
    if keys is not None:
        assert rows_per_shard is not None, "keys= requires rows_per_shard"
    stride = int(rows_per_shard) if rows_per_shard else ((1 << 31) // int(t))

    # ---- single sort by storage-row key ----
    key = keys if keys is not None else (ids_flat % t) * stride + ids_flat // t
    pos = jnp.arange(n, dtype=jnp.int32)
    sk, order = jax.lax.sort_key_val(key, pos)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    from cffm_tpu.ops.scan import cumsum_i32
    seg = cumsum_i32(is_first.astype(jnp.int32)) - 1     # (n,) in [0, n)
    n_unique = seg[-1] + 1

    # ---- owner bucket boundaries (compact-unique space) ----
    owner_pos = (sk // stride).astype(jnp.int32)          # (n,) sorted
    local_pos = (sk % stride).astype(jnp.int32)
    # first sorted position with owner >= o; that position (if < n) is a
    # run start => is_first => seg there counts the uniques before it
    bpos = jnp.searchsorted(owner_pos, jnp.arange(t + 1, dtype=jnp.int32)
                            ).astype(jnp.int32)
    seg_ext = jnp.concatenate([seg, n_unique[None]])
    start = seg_ext[bpos]                                 # (t+1,) uniques < o
    counts = start[1:] - start[:-1]
    overflow = jnp.sum(jnp.maximum(counts - capacity, 0)).astype(jnp.int32)

    # per-position rank within the owner bucket: seg minus the owner's
    # first segment. t is static, so a short select chain replaces the
    # old cummax forward-fill (an 11 ms scan at criteo bench shapes).
    start_of_owner = jnp.zeros_like(seg)
    for o in range(1, t):
        start_of_owner = jnp.where(owner_pos >= o, start[o], start_of_owner)
    rank_pos = seg - start_of_owner
    slot_of_sorted = jnp.where(rank_pos < capacity,
                               owner_pos * capacity + rank_pos, -1)
    # exchange slot per ORIGINAL position: ONE int-pair sort inverts the
    # permutation (every indexed formulation measured latency-bound).
    _, idx_of_pos = jax.lax.sort_key_val(order, slot_of_sorted)

    # ---- compact local-row stream + slice-assembled send buckets ----
    # compaction by sort: first occurrences keep their segment index as
    # the key, duplicates push to the back => val k = unique k's local
    # row. (Replaces segment_max into unique-slot space.)
    ckey = jnp.where(is_first, seg, n)
    _, lk = jax.lax.sort_key_val(ckey, local_pos)
    # pad so start[o] + C never clamps (start[o] <= n_unique <= n)
    lk_pad = jnp.concatenate([lk, jnp.full((capacity,), stride, jnp.int32)])
    bucket = jnp.stack([
        jax.lax.dynamic_slice(lk_pad, (start[o],), (capacity,))
        for o in range(t)])                               # (t, C)
    jcap = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    # mask slots past the owner's unique count (and past capacity) to
    # the ascending out-of-range sentinel
    send_ids = jnp.where(jcap < counts[:, None], bucket, stride)

    # ---- exchange: shard s receives the rows peers want from it ----
    recv_ids = jax.lax.all_to_all(send_ids, axis, 0, 0, tiled=False)
    recv_valid = recv_ids < stride

    return Routing(
        order=order.astype(jnp.int32),
        seg=seg,
        idx_of_pos=idx_of_pos,
        start=start,
        recv_ids=recv_ids,
        recv_valid=recv_valid,
        sentinel=stride,
        overflow=overflow,
    )


def routed_lookup(table_local: jax.Array, routing: Routing, axis: str,
                  out_dtype=None, assume_no_overflow: bool = False) -> jax.Array:
    """Serve + exchange + gather-back. Returns (n, W) rows for the
    original flat positions (zeros for overflow ids).

    assume_no_overflow: pass True when capacity STATICALLY covers the
    shard's distinct-id bound (capacity >= min(n, unique_bound)), i.e.
    every idx_of_pos is provably >= 0. Skips the overflow mask: the full
    (n, W) select, its VJP select on the backward pass, and the pred
    broadcast layout copies measured ~43 ms/step at criteo bench
    shapes."""
    t, c = routing.recv_ids.shape
    w = table_local.shape[1]
    out_dtype = out_dtype or table_local.dtype

    # serve local rows to each requesting peer (recv_ids ascend within
    # each peer bucket -> near-sequential HBM gather). Empty slots hold
    # the out-of-range sentinel; mode="clip" serves the last row's data
    # UNMASKED: no consumer ever gathers them (idx below only points at
    # valid slots), and dropping the where(recv_valid) select saved a
    # full (n, W) pass (~10 ms at criteo bench shapes).
    served = jnp.take(table_local, routing.recv_ids.reshape(-1), axis=0,
                      mode="clip").reshape(t, c, w).astype(out_dtype)
    return exchange_and_gather(served, routing, axis,
                               assume_no_overflow=assume_no_overflow)


def exchange_and_gather(served: jax.Array, routing: Routing, axis: str,
                        assume_no_overflow: bool = False) -> jax.Array:
    """Second half of routed_lookup: reverse all-to-all of a (T, C, W)
    served-rows buffer + the one wide gather to original positions.
    Factored out so the hierarchical exchange can substitute its own
    serve stage (the inter-host recursion) for the local-table gather."""
    t, c, w = served.shape

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

    Returns (row_ids (T, C), grads (T, C, W)) in the OWNER's local row
    space: row_ids is exactly `routing.recv_ids` (ascending per bucket,
    out-of-range sentinel for empty slots — see Routing); grads are the
    per-bucket dedup-summed row grads. Empty/sentinel slots carry
    GARBAGE grads (a neighbouring owner's rows, NOT zeros): consumers
    must drop slots by the id range — optim.rowwise.
    bucketed_rowwise_update and dcn_mesh's dense scatter both do.
    A row requested by several peers appears once per bucket with that
    bucket's partial sum; the cross-bucket total is formed by the
    consumer (the bucketed apply kernel sums buckets before the
    optimizer math).

    max_unique: optional static bound on this shard's distinct-id count
    (e.g. optim.rowwise.unique_bound of the local batch); shrinks the
    compact dedup buffer.

    The send buffers are T static dynamic-slices of the compact
    segment-sum output (owner o's uniques occupy [start[o],
    start[o]+count[o]) of the sorted unique stream) — no exchange-slot
    scatter exists on this path any more (the old compact->slot scatter
    measured 9.2 ms/step at criteo bench shapes).

    bf16 grads with a 128-multiple width take the fused Pallas
    sorted-segment kernel; other dtypes keep the exact-f32 segment_sum
    path (one bf16-class rounding either way for bf16; f32 payloads
    stay exact).
    """
    n, w = drows_flat.shape
    t, c = routing.recv_ids.shape

    dsorted = jnp.take(drows_flat, routing.order, axis=0, mode="clip")
    m = min(n, int(max_unique)) if max_unique else n

    if drows_flat.dtype == jnp.bfloat16 and w % 128 == 0:
        from cffm_tpu.ops.sorted_segment import EB, sorted_segment_sum_by_seg
        # +C tail so the dynamic slices below never clamp
        m_pad = -(-m // EB) * EB + -(-c // EB) * EB
        gsum = sorted_segment_sum_by_seg(routing.seg, dsorted, m_pad)
    else:
        gsum = jax.ops.segment_sum(
            dsorted.astype(jnp.float32), routing.seg, num_segments=m + c,
            indices_are_sorted=True).astype(drows_flat.dtype)

    send = jnp.stack([
        jax.lax.dynamic_slice(gsum, (routing.start[o], 0), (c, w))
        for o in range(t)])                               # (t, C, W)
    got = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)  # (T, C, W)
    return routing.recv_ids, got


# ---------------------------------------------------------------------------
# Convenience: capacity sizing
# ---------------------------------------------------------------------------


def pick_capacity(n_ids: int, num_shards: int, factor: float = 2.0,
                  rows_per_shard: int | None = None,
                  max_unique: int | None = None,
                  cap_rows: int = 0) -> int:
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
    exchange buffers 2.56M -> 1.71M slots at criteo batch 65536.

    cap_rows > 0 overrides the factor formula with an ABSOLUTE per-peer
    row budget (sized from measured bucket occupancy —
    scripts/measure_id_stats.py; still hard-capped above). At
    num_shards == 1 the override and factor are both ignored and the
    full distinct bound is covered: there is no exchange to shrink,
    only the dedup buffer, and undersizing it would silently drop ids
    on a single chip."""
    base = -(-n_ids // num_shards)
    if num_shards == 1:
        cap = n_ids
    elif cap_rows > 0:
        cap = int(cap_rows)
    else:
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
