"""Per-row sparse optimizers for embedding tables + dense optax factory.

Sparse path (SURVEY.md §3 "Per-row sparse optimizer"): optimizer state
is allocated row-for-row with the table (same sharding -> updates stay
local to the shard, no cross-device traffic beyond the gradient
all-to-all that routing already pays). Supported: per-row Adagrad
(row-wise accumulator, DLRM-style), Adam, SGD.

Update contract: the train step hands us the *touched rows* as
(row_ids (N,), grads (N, W)) where row_ids MAY repeat (duplicate ids in
the batch); grads for duplicate rows are segment-summed here before the
state update so Adagrad sees one accumulation per row per step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from cffm_tpu.config import OptimizerConfig
from cffm_tpu.ops.rounding import round_table_delta


def unique_bound(vocab_sizes, batch_size: int) -> int:
    """Static bound on distinct row ids in a (batch, fields) id block:
    per field at most min(vocab, batch) distinct rows; +1 sentinel slot."""
    return int(sum(min(int(v), batch_size) for v in vocab_sizes)) + 1


def rowwise_init(table: jax.Array, opt: OptimizerConfig) -> Dict:
    v = table.shape[0]
    if opt.sparse_optimizer == "adagrad":
        # Row-wise accumulator (scalar per row): cuts state HBM by W×
        # and matches DLRM-family row-wise Adagrad semantics.
        return {"accum": jnp.full((v, 1), opt.adagrad_init, jnp.float32)}
    if opt.sparse_optimizer == "adam":
        return {
            "m": jnp.zeros_like(table, jnp.float32),
            "v": jnp.zeros_like(table, jnp.float32),
            "t": jnp.zeros((), jnp.int32),
        }
    if opt.sparse_optimizer == "rowwise_adam":
        # Adam at half the state HBM: full first moment, row-SCALAR
        # second moment (EMA of mean(g^2) per row, the same compression
        # row-wise Adagrad uses). The production middle ground between
        # Adagrad (no momentum) and full Adam (2x table in f32).
        return {
            "m": jnp.zeros_like(table, jnp.float32),
            "v": jnp.zeros((v, 1), jnp.float32),
            "t": jnp.zeros((), jnp.int32),
        }
    if opt.sparse_optimizer == "sgd":
        return {}
    raise ValueError(opt.sparse_optimizer)


def _dedup_sum(row_ids: jax.Array, grads: jax.Array, num_rows: int,
               max_unique: int | None = None):
    """Sum duplicate-row grads; returns (unique-ish ids, summed grads, touched mask).

    Static-shape implementation: scatter-add into a dense (num_rows, W)
    buffer would defeat the purpose for big tables, so instead sort ids
    and segment-sum within the batch; each distinct row's total lands at
    its first occurrence, zeros elsewhere.

    `max_unique`: static upper bound on the distinct-id count (e.g.
    sum_f min(vocab_f, batch) for a per-field batch, or the local shard
    row count). Shrinks the f32 segment-sum transient AND the scatter
    slot count — measured 1.5x on the table scatter at Criteo bench
    shapes (scatter cost scales with index slots, not unique rows).
    """
    n = row_ids.shape[0]
    m = n if max_unique is None else min(n, int(max_unique))
    order = jnp.argsort(row_ids)
    sid = row_ids[order]
    sgrad = grads[order]  # stays in input dtype (bf16 halves the traffic)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(is_first) - 1  # < m by construction when the bound holds
    summed = jax.ops.segment_sum(sgrad.astype(jnp.float32), seg, num_segments=m,
                                 indices_are_sorted=True)
    seg_ids = jax.ops.segment_max(sid, seg, num_segments=m,
                                  indices_are_sorted=True)
    valid = jnp.arange(m) < (seg[-1] + 1)
    # rows: unique ids (garbage past the end masked to row 0 with zero grad)
    uids = jnp.where(valid, seg_ids, 0)
    ugrads = jnp.where(valid[:, None], summed, 0.0)
    return uids, ugrads, valid


def _should_stream(table: jax.Array, opt: OptimizerConfig, n_ids: int,
                   max_unique: int | None) -> bool:
    """Whether the full-table streaming kernel beats the XLA scatter.

    Streaming reads+writes the whole table once (contiguous, HBM-speed);
    the XLA scatter costs ~60ns per index slot. Streaming wins when the
    table is big AND a significant fraction of its rows is touched
    (measured crossover around a few percent on v5e; threshold 8% for
    margin). Small tables stay on the exact-f32 scatter path.
    """
    mode = getattr(opt, "streamed_update", "auto")
    if mode == "off":
        return False
    # rowwise_adam streams too: full m rides tile-for-tile with the
    # table, row-scalar v like adagrad's accumulator. Full adam (m AND
    # v table-shaped) stays on the exact-f32 scatter path.
    if opt.sparse_optimizer not in ("adagrad", "sgd", "rowwise_adam"):
        return False
    v, w = table.shape
    if w % 128 != 0 or table.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    from cffm_tpu.ops.streamed_update import pick_tile

    if pick_tile(v) == 0:
        return False
    if mode == "on":
        return True
    touched = min(n_ids, max_unique) if max_unique else n_ids
    return v * w >= (1 << 24) and touched >= 0.08 * v


def _per_field_sorted(row_ids: jax.Array, field_offsets,
                      mask_sentinels: bool, field_major: bool = False):
    """Sorted ids + global order via F independent column sorts.

    row_ids is the flattening of an (B, F) id block (or (F, B) when
    field_major — the fm full-rows path) whose field-f entries draw
    from the disjoint ascending range [offsets[f], offsets[f+1]) — the
    per-field structure of an embedding-id batch. Sorting each field
    (a batched (F, B) sort, cheaper than one length-B*F sort: the
    bitonic network is O(n log^2 n) and the F-way batch vectorizes
    across sublanes) and concatenating by field IS a global sort.
    Sentinels (id < 0) are mapped to the field's first id — their grads
    are already zeroed, and a zero-grad touch is an exact no-op for the
    streamed adagrad/sgd apply (S += 0).

    Returns (sid, order): the globally ascending ids and the matching
    permutation of the flat input layout. sort_key_val carries the
    positions through the sort so the sorted ids come out directly —
    a separate ids[order] gather is latency-bound (measured 9 ms for
    1.28M int32 at criteo bench shapes, vs ~1 ms for the sort itself).
    """
    offs = jnp.asarray(field_offsets, jnp.int32)
    f = offs.shape[0]
    b = row_ids.shape[0] // f
    if field_major:
        keys = row_ids.reshape(f, b)
        if mask_sentinels:
            keys = jnp.where(keys >= 0, keys, offs[:, None])
    else:
        ids2d = row_ids.reshape(b, f)
        if mask_sentinels:
            ids2d = jnp.where(ids2d >= 0, ids2d, offs[None, :])
        keys = ids2d.T  # (F, B) column sorts
    pos = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[None, :], (f, b))
    sk, sv = jax.lax.sort_key_val(keys, pos, dimension=-1)
    if field_major:
        # flat position of (f, b) in the fm layout is f*B + b
        order = (sv + (jnp.arange(f, dtype=jnp.int32) * b)[:, None]).reshape(-1)
    else:
        order = (sv * f + jnp.arange(f, dtype=jnp.int32)[:, None]).reshape(-1)
    return sk.reshape(-1), order


def _write_touched_rows(table: jax.Array, uids: jax.Array, uids_s: jax.Array,
                        delta: jax.Array, opt: OptimizerConfig, sr_key):
    """Apply f32 per-row `delta` to the touched rows of `table`.

    f32 tables take the direct scatter-add. bf16 tables go through
    gather -> f32 add -> (stochastic|nearest) round -> scatter-set
    (ops/rounding.py): an in-dtype scatter-add would round-to-nearest
    and drop any delta below the row's bf16 ulp. `uids` has invalid
    slots mapped to row 0 (read-only, harmless); `uids_s` maps them out
    of bounds so mode="drop" discards the write."""
    if table.dtype != jnp.bfloat16:
        return table.at[uids_s].add(
            delta.astype(table.dtype), mode="drop", unique_indices=True,
            indices_are_sorted=True)
    rows = table[uids]
    new_rows = round_table_delta(rows, delta, table.dtype,
                                 opt.table_rounding, sr_key)
    return table.at[uids_s].set(
        new_rows, mode="drop", unique_indices=True, indices_are_sorted=True)


def sr_keys(table_dtype: str, opt: OptimizerConfig, step, seed: int = 0):
    """(embed_key, linear_key) for stochastic table rounding, or
    (None, None) when the table dtype/rounding doesn't need one.
    Deterministic in (seed, step) => reproducible runs; callers under
    shard_map additionally fold in their axis index to decorrelate
    shards."""
    if (jnp.dtype(table_dtype) != jnp.bfloat16
            or opt.table_rounding != "stochastic"):
        return None, None
    base = jax.random.fold_in(jax.random.key(seed ^ 0x5EED), step)
    return jax.random.fold_in(base, 0), jax.random.fold_in(base, 1)


def rowwise_update(
    table: jax.Array,
    state: Dict,
    row_ids: jax.Array,
    grads: jax.Array,
    opt: OptimizerConfig,
    lr_scale: float = 1.0,
    max_unique: int | None = None,
    field_offsets=None,
    mask_sentinels: bool = True,
    sentinel_grads_zero: bool = False,
    sr_key=None,
    field_major: bool = False,
) -> Tuple[jax.Array, Dict]:
    """Apply a sparse per-row update. row_ids (N,), grads (N, W).
    field_major: row_ids flattens an (F, B) block instead of (B, F)
    (the fm full-rows path) — only affects the per-field sort's order
    arithmetic.

    Duplicates are pre-summed; sentinel id < 0 rows are dropped.
    max_unique: optional static bound on distinct ids (incl. one slot
    for the sentinel bucket); see _dedup_sum.
    field_offsets: when row_ids flattens an (B, F) per-field id block
    (column f in [offsets[f], offsets[f+1])), pass the F field offsets
    to replace the global argsort with a cheaper batched per-field
    sort on the streamed path.
    mask_sentinels: pass False when the caller guarantees row_ids >= 0
    (the single-host data layer hashes ids in-range) — skips a full
    zeroing pass over grads (measured 5 ms on the 1.6 GB grad block).
    sentinel_grads_zero: pass True when sentinel (id < 0) rows are
    guaranteed to carry exact-zero grads already (the sharded
    grad_return's empty exchange slots are zeros-initialized) — keeps
    the id remap but skips the same full-width zeroing pass.
    sr_key: rng key for stochastic rounding into bf16 tables (required
    when table.dtype is bfloat16 and opt.table_rounding="stochastic";
    unused for f32 tables).
    """
    w = table.shape[1]
    assert grads.shape[-1] == w
    row_ids = row_ids.reshape(-1)
    grads = grads.reshape(-1, w)  # dedup-summed in f32 downstream
    if mask_sentinels:
        sentinel_ok = row_ids >= 0
        # Sentinels route to the out-of-bounds row num_rows (NOT row 0):
        # a zero-grad "touch" of row 0 is harmless for adagrad but would
        # still decay Adam's m/v and perturb the table, so sentinels must
        # never form a real segment. mode="drop" scatters discard them.
        safe_ids = jnp.where(sentinel_ok, row_ids, table.shape[0])
        if not sentinel_grads_zero:
            grads = jnp.where(sentinel_ok[:, None], grads,
                              jnp.zeros((), grads.dtype))
    else:
        safe_ids = row_ids

    use_streamed = _should_stream(table, opt, row_ids.shape[0], max_unique)
    lr = opt.sparse_lr * lr_scale
    if use_streamed:
        # Streamed path: sort once, then the fused sorted-segment kernel
        # replaces XLA's scatter-based segment_sum/segment_max (which
        # cost ~45ms at criteo bench shapes), and the streamed apply
        # kernel replaces the table scatter. m_pad is pre-sized so the
        # apply's entry windows need no extra padding pass.
        from cffm_tpu.ops.sorted_segment import sorted_segment_sum_compact
        from cffm_tpu.ops.streamed_update import (padded_entries, pick_tile,
                                                  streamed_rowwise_apply)

        num_rows = table.shape[0]
        r = pick_tile(num_rows)
        m_pad = padded_entries(
            min(row_ids.shape[0], max_unique or row_ids.shape[0]), r)
        if (field_offsets is not None
                and row_ids.shape[0] % len(tuple(field_offsets)) == 0):
            sid, order = _per_field_sorted(row_ids, field_offsets,
                                           mask_sentinels, field_major)
        else:
            pos = jnp.arange(safe_ids.shape[0], dtype=jnp.int32)
            sid, order = jax.lax.sort_key_val(safe_ids, pos)
        uids, g, count = sorted_segment_sum_compact(sid, grads[order], m_pad,
                                                    max_id=num_rows)
        g = clip_rows(g, opt)
        uids_s = jnp.where(jnp.arange(m_pad) < count, uids,
                           num_rows).astype(jnp.int32)
        seed = None
        if (table.dtype == jnp.bfloat16 and opt.table_rounding == "stochastic"):
            if sr_key is None:
                raise ValueError("bf16 streamed update with stochastic "
                                 "rounding needs sr_key")
            seed = jax.random.randint(sr_key, (), 0, 2**31 - 1, jnp.int32)
        if opt.sparse_optimizer == "adagrad":
            new_table, new_accum = streamed_rowwise_apply(
                table, state["accum"], uids_s, g, lr, opt.eps, r=r,
                sr_seed=seed)
            return new_table, {"accum": new_accum}
        if opt.sparse_optimizer == "rowwise_adam":
            from cffm_tpu.ops.streamed_update import (
                streamed_rowwise_adam_apply)

            t = state["t"] + 1
            new_table, new_m, new_v = streamed_rowwise_adam_apply(
                table, state["m"], state["v"], uids_s, g, lr, opt.eps,
                opt.adam_b1, opt.adam_b2, t, r=r, sr_seed=seed)
            return new_table, {"m": new_m, "v": new_v, "t": t}
        new_table, _ = streamed_rowwise_apply(
            table, None, uids_s, g, lr, opt.eps, r=r, sr_seed=seed)
        return new_table, state

    uids, g, valid = _dedup_sum(safe_ids, grads, table.shape[0], max_unique)
    g = clip_rows(g, opt)

    if opt.sparse_optimizer == "adagrad":
        accum = state["accum"]
        num_rows = table.shape[0]
        # uids are unique + ascending within the valid prefix; sentinel
        # out-of-bounds ids (dropped) keep the hints truthful.
        uids_s = jnp.where(valid, uids, num_rows)
        g2 = jnp.mean(g * g, axis=-1, keepdims=True)  # row-wise accumulator
        new_accum = accum.at[uids_s].add(
            g2, mode="drop", unique_indices=True, indices_are_sorted=True)
        denom = jnp.sqrt(new_accum[uids]) + opt.eps
        delta = -lr * g / denom
        new_table = _write_touched_rows(table, uids, uids_s, delta, opt, sr_key)
        return new_table, {"accum": new_accum}

    if opt.sparse_optimizer == "adam":
        t = state["t"] + 1
        m = state["m"]
        v = state["v"]
        num_rows = table.shape[0]
        # Same sentinel treatment as the adagrad branch: invalid dedup-tail
        # slots are routed to an out-of-bounds row and dropped, so untouched
        # rows (incl. row 0, Criteo's missing-value bucket) keep their m/v
        # bit-exactly.  uids are unique + ascending within the valid prefix.
        uids_s = jnp.where(valid, uids, num_rows)
        gm = jnp.where(valid[:, None], g, 0.0)
        new_m = m.at[uids_s].multiply(
            opt.adam_b1, mode="drop", unique_indices=True, indices_are_sorted=True)
        new_m = new_m.at[uids_s].add(
            (1 - opt.adam_b1) * gm, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        new_v = v.at[uids_s].multiply(
            opt.adam_b2, mode="drop", unique_indices=True, indices_are_sorted=True)
        new_v = new_v.at[uids_s].add(
            (1 - opt.adam_b2) * gm * gm, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        mhat = new_m[uids] / (1 - opt.adam_b1 ** t.astype(jnp.float32))
        vhat = new_v[uids] / (1 - opt.adam_b2 ** t.astype(jnp.float32))
        delta = jnp.where(valid[:, None], -lr * mhat / (jnp.sqrt(vhat) + opt.eps), 0.0)
        new_table = _write_touched_rows(table, uids, uids_s, delta, opt, sr_key)
        return new_table, {"m": new_m, "v": new_v, "t": t}

    if opt.sparse_optimizer == "rowwise_adam":
        t = state["t"] + 1
        num_rows = table.shape[0]
        # sentinel treatment identical to adam: invalid dedup-tail slots
        # route out of bounds so untouched rows keep m/v bit-exactly
        uids_s = jnp.where(valid, uids, num_rows)
        gm = jnp.where(valid[:, None], g, 0.0)
        new_m = state["m"].at[uids_s].multiply(
            opt.adam_b1, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        new_m = new_m.at[uids_s].add(
            (1 - opt.adam_b1) * gm, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        g2 = jnp.mean(gm * gm, axis=-1, keepdims=True)  # row-scalar v
        new_v = state["v"].at[uids_s].multiply(
            opt.adam_b2, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        new_v = new_v.at[uids_s].add(
            (1 - opt.adam_b2) * g2, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        mhat = new_m[uids] / (1 - opt.adam_b1 ** t.astype(jnp.float32))
        vhat = new_v[uids] / (1 - opt.adam_b2 ** t.astype(jnp.float32))
        delta = jnp.where(valid[:, None],
                          -lr * mhat / (jnp.sqrt(vhat) + opt.eps), 0.0)
        new_table = _write_touched_rows(table, uids, uids_s, delta, opt, sr_key)
        return new_table, {"m": new_m, "v": new_v, "t": t}

    if opt.sparse_optimizer == "sgd":
        uids_s = jnp.where(valid, uids, table.shape[0])
        delta = jnp.where(valid[:, None], -lr * g, 0.0)
        new_table = _write_touched_rows(table, uids, uids_s, delta, opt, sr_key)
        return new_table, state

    raise ValueError(opt.sparse_optimizer)


def bucketed_rowwise_update(
    table: jax.Array,
    state: Dict,
    ids_bkt: jax.Array,
    grads_bkt: jax.Array,
    opt: OptimizerConfig,
    lr_scale: float = 1.0,
    sr_key=None,
) -> Tuple[jax.Array, Dict]:
    """Sparse per-row update straight from the sharded gradient-return
    buckets (parallel/sharded_embedding.grad_return): ids_bkt (T, C)
    local rows, ascending + unique per bucket, with the out-of-range
    sentinel (>= table rows) in empty slots; grads_bkt (T, C, W) the
    per-bucket dedup-summed grads (GARBAGE in sentinel slots — they
    are dropped by id range, never zeroed).

    When the bucketed streamed kernel applies (ops/streamed_update.
    bucketed_tile), the buckets feed it DIRECTLY — no sort, no second
    dedup, no exchange-slot scatter (that re-dedup pipeline measured
    ~19 ms/step at criteo bench shapes, scripts/trace_sharded.py
    2026-08-20); cross-bucket duplicates (rows requested by several
    peers) are summed inside the kernel before the optimizer math, and
    opt.clip_norm is applied there to the cross-bucket total.
    Otherwise falls back to flattening into rowwise_update, whose
    global dedup handles the cross-bucket duplicates (sentinel ids
    sort last and drop on every scatter; their garbage grads land
    nowhere)."""
    v, w = table.shape
    nb, c = ids_bkt.shape[0], ids_bkt.shape[1]
    lr = opt.sparse_lr * lr_scale
    mode = getattr(opt, "streamed_update", "auto")
    from cffm_tpu.ops.streamed_update import bucketed_tile

    r = 0
    if (mode != "off"
            and opt.sparse_optimizer in ("adagrad", "sgd", "rowwise_adam")
            and table.dtype in (jnp.float32, jnp.bfloat16)
            and grads_bkt.shape[-1] == w):
        r = bucketed_tile(v, w, nb, c)
    touched = min(nb * c, v)
    if r and (mode == "on" or (v * w >= (1 << 24) and touched >= 0.08 * v)):
        from cffm_tpu.ops.streamed_update import (bucketed_rowwise_adam_apply,
                                                  bucketed_rowwise_apply)

        seed = None
        if table.dtype == jnp.bfloat16 and opt.table_rounding == "stochastic":
            if sr_key is None:
                raise ValueError("bf16 streamed update with stochastic "
                                 "rounding needs sr_key")
            seed = jax.random.randint(sr_key, (), 0, 2**31 - 1, jnp.int32)
        if opt.sparse_optimizer == "adagrad":
            new_table, new_accum = bucketed_rowwise_apply(
                table, state["accum"], ids_bkt, grads_bkt, lr, opt.eps,
                clip=opt.clip_norm, r=r, sr_seed=seed)
            return new_table, {"accum": new_accum}
        if opt.sparse_optimizer == "rowwise_adam":
            t = state["t"] + 1
            new_table, new_m, new_v = bucketed_rowwise_adam_apply(
                table, state["m"], state["v"], ids_bkt, grads_bkt, lr,
                opt.eps, opt.adam_b1, opt.adam_b2, t, clip=opt.clip_norm,
                r=r, sr_seed=seed)
            return new_table, {"m": new_m, "v": new_v, "t": t}
        new_table, _ = bucketed_rowwise_apply(
            table, None, ids_bkt, grads_bkt, lr, opt.eps,
            clip=opt.clip_norm, r=r, sr_seed=seed)
        return new_table, state

    # Fallback: global dedup over the flattened buckets. Sentinel ids
    # (>= v) sort to the end, form their own segments, and every
    # scatter drops them out-of-bounds — the garbage grads they carry
    # never land, so no zeroing pass is needed (mask_sentinels=False:
    # all ids are >= 0 by construction).
    return rowwise_update(
        table, state, ids_bkt.reshape(-1), grads_bkt.reshape(-1, w), opt,
        lr_scale=lr_scale, max_unique=v + 1, mask_sentinels=False,
        sr_key=sr_key)


def dense_rowwise_apply(table: jax.Array, state: Dict, g: jax.Array,
                        opt: OptimizerConfig, lr_scale: float = 1.0,
                        sr_key=None) -> Tuple[jax.Array, Dict]:
    """Dense-form row-wise update: g is a full table-shaped gradient
    (untouched rows are all-zero => exact no-op for adagrad/sgd, same
    semantics as the sparse scatter path). Used where grads are psum'd
    across table REPLICAS (DCN-aware intra-host sharding) and arrive
    dense. Adam's decay-every-row dense form differs from the sparse
    path, so it is not offered here.
    """
    lr = opt.sparse_lr * lr_scale
    # grads may arrive in the compute dtype (bf16 over the DCN psum);
    # the accumulator/delta math must run f32 — mean(g*g) in bf16 loses
    # the accumulator's low bits every step.
    g = clip_rows(g.astype(jnp.float32), opt)
    if opt.sparse_optimizer == "adagrad":
        new_accum = state["accum"] + jnp.mean(g * g, axis=-1, keepdims=True)
        delta = -lr * g / (jnp.sqrt(new_accum) + opt.eps)
        return (round_table_delta(table, delta, table.dtype,
                                  opt.table_rounding, sr_key)
                if table.dtype == jnp.bfloat16
                else table + delta.astype(table.dtype)), {"accum": new_accum}
    if opt.sparse_optimizer == "sgd":
        return (round_table_delta(table, -lr * g, table.dtype,
                                  opt.table_rounding, sr_key)
                if table.dtype == jnp.bfloat16
                else table + (-lr * g).astype(table.dtype)), state
    raise ValueError(
        f"dense_rowwise_apply supports adagrad/sgd, got {opt.sparse_optimizer}")


def schedule_factor(opt: OptimizerConfig, step: jax.Array,
                    total_steps: int) -> jax.Array:
    """Multiplicative LR factor at `step` (traced-safe, f32 scalar).

    Linear warmup over opt.warmup_steps, then constant/cosine/linear
    decay to opt.end_lr_factor across opt.decay_steps (0 = total_steps).
    Applied identically to the dense optax updates and the sparse
    per-row updates (via lr_scale), so both paths ride one curve —
    scaling the post-optimizer update by f is exactly an LR of f*lr for
    adam/adagrad/sgd (their accumulators are LR-independent)."""
    s = jnp.asarray(step, jnp.float32)
    warm = float(opt.warmup_steps)
    f = jnp.minimum((s + 1.0) / warm, 1.0) if warm > 0 else jnp.float32(1.0)
    if opt.lr_schedule == "constant":
        return f
    total = float(opt.decay_steps or total_steps)
    end = float(opt.end_lr_factor)
    prog = jnp.clip((s - warm) / max(total - warm, 1.0), 0.0, 1.0)
    if opt.lr_schedule == "cosine":
        decay = end + (1.0 - end) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
    elif opt.lr_schedule == "linear":
        decay = end + (1.0 - end) * (1.0 - prog)
    else:
        raise ValueError(f"unknown lr_schedule {opt.lr_schedule!r}")
    return f * decay


def scale_updates(updates, factor):
    """Scale an optax update pytree by the schedule factor."""
    return jax.tree.map(lambda u: u * factor.astype(u.dtype), updates)


def make_dense_optimizer(opt: OptimizerConfig) -> optax.GradientTransformation:
    if opt.dense_optimizer == "adam":
        tx = optax.adam(opt.dense_lr, b1=opt.adam_b1, b2=opt.adam_b2, eps=opt.eps)
    elif opt.dense_optimizer == "adagrad":
        tx = optax.adagrad(opt.dense_lr, initial_accumulator_value=opt.adagrad_init)
    elif opt.dense_optimizer == "sgd":
        tx = optax.sgd(opt.dense_lr)
    else:
        raise ValueError(opt.dense_optimizer)
    if opt.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(opt.weight_decay), tx)
    if opt.clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(opt.clip_norm), tx)
    return tx


def clip_rows(g: jax.Array, opt: OptimizerConfig) -> jax.Array:
    """Per-row L2 clip of sparse row grads (N, W) to opt.clip_norm.
    No-op when clip_norm == 0. f32 norm math regardless of g dtype."""
    if opt.clip_norm <= 0:
        return g
    n = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    scale = jnp.minimum(1.0, opt.clip_norm / jnp.maximum(n, 1e-12))
    return g * scale.astype(g.dtype)
