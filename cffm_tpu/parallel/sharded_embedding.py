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
    k_of_pos: jax.Array     # (n,) unique-slot index of each ORIGINAL position
    owner_k: jax.Array      # (n,) owning shard of unique id k (t if !valid)
    rank_k: jax.Array       # (n,) slot within the (owner) bucket
    valid_k: jax.Array      # (n,) bool: k < n_unique and rank < capacity
    recv_ids: jax.Array     # (T, C) local row ids this shard must serve
    recv_valid: jax.Array   # (T, C) bool mask of served slots
    overflow: jax.Array     # () int32: unique ids dropped (capacity overflow)


def _axis_size(axis: str) -> jax.Array:
    return jax.lax.axis_size(axis)


def build_routing(ids_flat: jax.Array, capacity: int, axis: str,
                  rows_per_shard: int | None = None) -> Routing:
    """Dedup + bucket-by-owner + all-to-all ID exchange. Per-shard view.

    ids_flat: (n,) int32 global ids of this shard's batch.
    capacity: per-peer bucket size C (static).
    rows_per_shard: the peers' local table row count Vs (v_pad // t).
    Optional — without it a conservative 2^31/t key stride is used —
    but passing it keeps the sort key dense.

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

    # ---- assemble send buffer of LOCAL row ids (T, C) ----
    # send positions owner*C + rank strictly increase over valid k ->
    # sorted unique scatter; invalid -> out of bounds, dropped.
    send_pos = jnp.where(send_ok, owner * capacity + rank, t * capacity)
    send_buf = jnp.full((t * capacity,), -1, jnp.int32).at[send_pos].set(
        local_row.astype(jnp.int32), mode="drop", unique_indices=True,
        indices_are_sorted=True).reshape(t, capacity)

    # ---- exchange: shard s receives the rows peers want from it ----
    recv_ids = jax.lax.all_to_all(send_buf, axis, 0, 0, tiled=False)
    recv_valid = recv_ids >= 0

    # inverse permutation -> unique-slot index per ORIGINAL position
    # (int32 scatter + gather; lets the lookup finish with ONE wide row
    # gather instead of a row gather + full-width row scatter).
    inv = jnp.zeros((n,), jnp.int32).at[order].set(pos)
    k_of_pos = jnp.take(seg, inv)

    return Routing(
        order=order.astype(jnp.int32),
        seg=seg,
        k_of_pos=k_of_pos,
        owner_k=owner.astype(jnp.int32),
        rank_k=rank.astype(jnp.int32),
        valid_k=send_ok,
        recv_ids=recv_ids,
        recv_valid=recv_valid,
        overflow=overflow,
    )


def routed_lookup(table_local: jax.Array, routing: Routing, axis: str,
                  out_dtype=None) -> jax.Array:
    """Serve + exchange + gather-back. Returns (n, W) rows for the
    original flat positions (zeros for overflow ids)."""
    t, c = routing.recv_ids.shape
    w = table_local.shape[1]
    out_dtype = out_dtype or table_local.dtype

    # serve local rows to each requesting peer (recv_ids ascend within
    # each peer bucket -> near-sequential HBM gather)
    safe = jnp.maximum(routing.recv_ids, 0)
    served = jnp.take(table_local, safe.reshape(-1), axis=0).reshape(t, c, w)
    served = jnp.where(routing.recv_valid[..., None], served, 0).astype(out_dtype)

    # reverse exchange: my requested rows come back
    got = jax.lax.all_to_all(served, axis, 0, 0, tiled=False).reshape(t * c, w)

    # ONE wide gather straight to original positions: position p's row
    # sits at owner*C + rank of its unique slot k_of_pos[p]; overflow
    # slots clip in-range and are masked to zero.
    kpos = jnp.clip(routing.owner_k * c + routing.rank_k, 0, t * c - 1)
    idx = jnp.take(kpos, routing.k_of_pos)
    ok = jnp.take(routing.valid_k, routing.k_of_pos)
    rows = jnp.take(got, idx, axis=0)
    return jnp.where(ok[:, None], rows, 0)


def grad_return(drows_flat: jax.Array, routing: Routing, axis: str
                ) -> Tuple[jax.Array, jax.Array]:
    """Reverse path: dedup-sum grads per unique id and all-to-all them
    back to the owner shard.

    Returns (row_ids (T*C,), grads (T*C, W)) in the OWNER's local row
    space, sentinel -1 rows for empty slots — exactly the contract of
    optim.rowwise.rowwise_update.
    """
    n, w = drows_flat.shape
    t, c = routing.recv_ids.shape

    dsorted = jnp.take(drows_flat, routing.order, axis=0)
    guniq = jax.ops.segment_sum(dsorted.astype(jnp.float32), routing.seg,
                                num_segments=n,
                                indices_are_sorted=True)  # (n, W) per unique k

    # Exchange payload rides in the caller's grad dtype: summation stays
    # f32-exact above; a bf16 compute dtype then halves the reverse
    # all-to-all's ICI bytes (one bf16 rounding of the per-unique sums,
    # same rounding class as the single-chip dedup kernel's bf16 gsum).
    # Each valid unique k owns exactly one ascending slot -> sorted
    # unique scatter-SET (no read-modify-write scatter-add).
    send_pos = jnp.where(routing.valid_k,
                         routing.owner_k * c + routing.rank_k, t * c)
    send = jnp.zeros((t * c, w), drows_flat.dtype).at[send_pos].set(
        guniq.astype(drows_flat.dtype), mode="drop", unique_indices=True,
        indices_are_sorted=True).reshape(t, c, w)

    got = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)  # (T, C, W)
    row_ids = jnp.where(routing.recv_valid, routing.recv_ids, -1).reshape(-1)
    return row_ids, got.reshape(t * c, w)


# ---------------------------------------------------------------------------
# Convenience: capacity sizing
# ---------------------------------------------------------------------------


def pick_capacity(n_ids: int, num_shards: int, factor: float = 2.0,
                  rows_per_shard: int | None = None) -> int:
    """Per-peer bucket capacity: even split times slack, lane-rounded.

    Hard caps (always correct, no overflow possible beyond them):
    a shard can't request more distinct ids than it has ids (n_ids),
    and a peer can't serve more distinct rows than it owns
    (rows_per_shard). Without them, T=1 benches allocated send/serve
    buffers LARGER than the whole table (5.1M slots x 640 lanes =
    6.5 GB of bf16 transients at criteo bench shapes)."""
    base = -(-n_ids // num_shards)
    cap = int(base * factor)
    cap = min(cap, n_ids)
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
