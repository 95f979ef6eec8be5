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

    order: jax.Array        # (n,) argsort of flat ids
    seg: jax.Array          # (n,) segment id of each sorted position
    owner_k: jax.Array      # (n,) owning shard of unique id k (junk if !valid)
    rank_k: jax.Array       # (n,) slot within the (owner) bucket
    valid_k: jax.Array      # (n,) bool: k < n_unique and rank < capacity
    recv_ids: jax.Array     # (T, C) local row ids this shard must serve
    recv_valid: jax.Array   # (T, C) bool mask of served slots
    overflow: jax.Array     # () int32: unique ids dropped (capacity overflow)


def _axis_size(axis: str) -> jax.Array:
    return jax.lax.axis_size(axis)


def build_routing(ids_flat: jax.Array, capacity: int, axis: str) -> Routing:
    """Dedup + bucket-by-owner + all-to-all ID exchange. Per-shard view.

    ids_flat: (n,) int32 global ids of this shard's batch.
    capacity: per-peer bucket size C (static).
    """
    n = ids_flat.shape[0]
    t = _axis_size(axis)

    # ---- sort-based dedup (static shapes) ----
    order = jnp.argsort(ids_flat)
    sid = ids_flat[order]
    is_first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(is_first) - 1                       # (n,) in [0, n)
    n_unique = seg[-1] + 1
    uid = jax.ops.segment_max(sid, seg, num_segments=n)  # unique ids at [0, n_unique)
    k_valid = jnp.arange(n) < n_unique

    # ---- bucket unique ids by owner shard ----
    owner = jnp.where(k_valid, uid % t, t)               # invalid -> bucket t (dropped)
    # rank of k within its owner bucket, stable order
    owner_sort = jnp.argsort(owner, stable=True)
    owner_sorted = owner[owner_sort]
    start = jnp.searchsorted(owner_sorted, jnp.arange(t + 1))
    rank_sorted = jnp.arange(n) - start[jnp.clip(owner_sorted, 0, t)]
    rank = jnp.zeros((n,), jnp.int32).at[owner_sort].set(rank_sorted.astype(jnp.int32))

    in_cap = rank < capacity
    send_ok = k_valid & in_cap
    overflow = jnp.sum(k_valid & ~in_cap).astype(jnp.int32)

    # ---- assemble send buffer of LOCAL row ids (T, C) ----
    # invalid entries scatter to out-of-bounds bucket t -> dropped.
    local_row = uid // t
    send_buf = jnp.full((t, capacity), -1, jnp.int32).at[
        jnp.where(send_ok, owner, t), jnp.where(send_ok, rank, 0)
    ].set(local_row.astype(jnp.int32), mode="drop")

    # ---- exchange: shard s receives the rows peers want from it ----
    recv_ids = jax.lax.all_to_all(send_buf, axis, 0, 0, tiled=False)
    recv_valid = recv_ids >= 0

    return Routing(
        order=order.astype(jnp.int32),
        seg=seg.astype(jnp.int32),
        owner_k=owner.astype(jnp.int32),
        rank_k=rank.astype(jnp.int32),
        valid_k=send_ok,
        recv_ids=recv_ids,
        recv_valid=recv_valid,
        overflow=overflow,
    )


def routed_lookup(table_local: jax.Array, routing: Routing, axis: str,
                  out_dtype=None) -> jax.Array:
    """Serve + exchange + scatter-back. Returns (n, W) rows for the
    original flat positions (zeros for overflow ids)."""
    n = routing.order.shape[0]
    t, c = routing.recv_ids.shape
    w = table_local.shape[1]
    out_dtype = out_dtype or table_local.dtype

    # serve local rows to each requesting peer
    safe = jnp.maximum(routing.recv_ids, 0)
    served = jnp.take(table_local, safe.reshape(-1), axis=0).reshape(t, c, w)
    served = jnp.where(routing.recv_valid[..., None], served, 0).astype(out_dtype)

    # reverse exchange: my requested rows come back
    got = jax.lax.all_to_all(served, axis, 0, 0, tiled=False)  # (T, C, W)

    # unique-k rows (junk where invalid)
    rows_k = got[routing.owner_k % t, jnp.minimum(routing.rank_k, c - 1)]
    rows_k = jnp.where(routing.valid_k[:, None], rows_k, 0)

    # expand to sorted positions, then unsort
    rows_sorted = rows_k[routing.seg]                     # (n, W)
    out = jnp.zeros((n, w), out_dtype).at[routing.order].set(rows_sorted)
    return out


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

    dsorted = drows_flat[routing.order]
    guniq = jax.ops.segment_sum(dsorted.astype(jnp.float32), routing.seg,
                                num_segments=n)          # (n, W) per unique k

    # Exchange payload rides in the caller's grad dtype: summation stays
    # f32-exact above; a bf16 compute dtype then halves the reverse
    # all-to-all's ICI bytes (one bf16 rounding of the per-unique sums,
    # same rounding class as the single-chip dedup kernel's bf16 gsum).
    send = jnp.zeros((t, c, w), drows_flat.dtype)
    safe_owner = jnp.where(routing.valid_k, routing.owner_k, t)
    send = send.at[safe_owner, routing.rank_k].add(
        guniq.astype(drows_flat.dtype), mode="drop")

    got = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)  # (T, C, W)
    row_ids = jnp.where(routing.recv_valid, routing.recv_ids, -1).reshape(-1)
    return row_ids, got.reshape(t * c, w)


# ---------------------------------------------------------------------------
# Convenience: capacity sizing
# ---------------------------------------------------------------------------


def pick_capacity(n_ids: int, num_shards: int, factor: float = 2.0) -> int:
    """Per-peer bucket capacity: even split times slack, lane-rounded."""
    base = -(-n_ids // num_shards)
    cap = int(base * factor)
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
