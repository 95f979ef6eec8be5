"""SPMD train/eval steps: row-sharded tables + data-parallel dense.

The whole step runs inside one `shard_map` over the flat "data" axis
(SURVEY.md §4.1 call stack): routed dedup lookup (all-to-all x2),
model forward/backward on the local batch shard, pmean of dense grads,
reverse all-to-all of row grads, and the colocated per-row sparse
update — the five collective crossings of the survey's hot path.

Dense params and optimizer state are replicated (P()); tables, their
per-row optimizer state, and the batch ride P("data"). The dense optax
update runs identically on every shard (inputs are pmean'd), keeping
replicas bit-identical without a broadcast.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cffm_tpu import metrics
from cffm_tpu.config import TrainConfig
from cffm_tpu.models import cffm as model_lib
from cffm_tpu.optim.rowwise import (bucketed_rowwise_update,
                                    make_dense_optimizer, rowwise_init,
                                    scale_updates, schedule_factor, sr_keys,
                                    unique_bound)
from cffm_tpu.parallel import sharded_embedding as se
from cffm_tpu.train import TrainState, merge_dense_params, split_dense_params

AXIS = "data"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def create_sharded_state(cfg: TrainConfig, rng: jax.Array, mesh: Mesh) -> TrainState:
    """Init with tables/opt-state row-sharded, dense replicated.

    Table storage uses the mod-sharding permutation (see
    sharded_embedding.py): vocab padded to a multiple of the shard
    count; logical id g lives at storage row (g % T) * Vs + g // T.
    Init is i.i.d. so the permutation does not change the distribution.
    """
    t = mesh.devices.size
    mcfg = cfg.model
    v_pad = _round_up(mcfg.total_vocab, t)

    params = model_lib.init_params(rng, mcfg, skip_tables=True)
    # tables are created here directly at padded size
    k1, k2 = jax.random.split(rng)
    tdt = jnp.dtype(mcfg.table_dtype)
    table = (0.01 * jax.random.normal(k1, (v_pad, mcfg.table_width),
                                      dtype=jnp.float32)).astype(tdt)
    params["embed"]["table"] = jax.device_put(
        table, NamedSharding(mesh, P(AXIS, None)))
    if mcfg.use_first_order and not mcfg.fused_linear:
        lin = (0.01 * jax.random.normal(k2, (v_pad, 1),
                                        dtype=jnp.float32)).astype(tdt)
        params["linear"]["table"] = jax.device_put(
            lin, NamedSharding(mesh, P(AXIS, None)))

    repl = NamedSharding(mesh, P())
    params["conv"] = jax.device_put(params["conv"], repl)
    params["tower"] = jax.device_put(params["tower"], repl)
    if mcfg.use_first_order:
        params["linear"]["bias"] = jax.device_put(params["linear"]["bias"], repl)

    tx = make_dense_optimizer(cfg.optim)
    dense_opt_state = jax.device_put(tx.init(split_dense_params(params)), repl)

    sharded = NamedSharding(mesh, P(AXIS, None))
    sparse = {"embed": jax.tree.map(
        lambda x: jax.device_put(x, sharded) if x.ndim == 2 else jax.device_put(x, repl),
        rowwise_init(params["embed"]["table"], cfg.optim))}
    if mcfg.use_first_order and not mcfg.fused_linear:
        sparse["linear"] = jax.tree.map(
            lambda x: jax.device_put(x, sharded) if x.ndim == 2 else jax.device_put(x, repl),
            rowwise_init(params["linear"]["table"], cfg.optim))

    # step counter replicated ON THE MESH: a bare jnp.zeros(()) carries
    # an empty sharding, while the step output's counter (computed under
    # jit with the mesh in scope) carries an Auto mesh sharding — the
    # aval mismatch made call #1 retrace+recompile the entire program
    # (~95s at criteo shapes, measured round 3: the whole "sharded path
    # is 54x slower" mystery was this one recompile amortized over a
    # 10-step bench loop).
    step0 = jax.device_put(jnp.zeros((), jnp.int32), repl)
    return TrainState(step0, params, dense_opt_state, sparse)


def _local_step(params, dense_opt_state, sparse_opt_state, step_no,
                ids, dense, labels,
                *, cfg: TrainConfig, capacity: int, interaction_fn):
    """Per-shard body (runs under shard_map)."""
    mcfg = cfg.model
    b_loc, f = ids.shape
    w = mcfg.table_width
    cdt = jnp.dtype(mcfg.compute_dtype)

    table_local = params["embed"]["table"]   # (Vs, W) local shard
    # Field-major flagship path: routing/grad_return track positions
    # abstractly, so transposing the flat id order swaps the recovered
    # rows (and returned grads) into the layout the fm kernel consumes
    # with zero retiling copies (see models.cffm.wants_field_major).
    fm = model_lib.wants_field_major(params, mcfg, interaction_fn)
    flat_ids = ids.T.reshape(-1) if fm else ids.reshape(-1)

    from cffm_tpu.utils.debugging import collective_probe

    def dbg(tag):
        collective_probe(tag, AXIS, cfg.debug_barriers)

    # static distinct-id bound for this shard's batch: drives the
    # no-overflow-possible sorted-scatter hint and the compact dedup
    # buffer in grad_return
    batch_unique = unique_bound(mcfg.vocab_sizes, b_loc)
    # capacity statically covers the bound -> overflow impossible ->
    # the lookups skip their full-width overflow masks
    no_ovf = capacity >= min(flat_ids.shape[0], batch_unique)

    dbg("routing-a2a:enter")
    routing = se.build_routing(flat_ids, capacity, AXIS,
                               rows_per_shard=table_local.shape[0],
                               max_unique=batch_unique)
    dbg("lookup-a2a:enter")
    rows = se.routed_lookup(table_local, routing, AXIS, out_dtype=cdt,
                            assume_no_overflow=no_ovf)
    dbg("lookup-a2a:exit")
    emb_rows = rows.reshape(f, b_loc, w) if fm else rows.reshape(b_loc, f, w)
    separate_linear = mcfg.use_first_order and not mcfg.fused_linear
    if separate_linear:
        lin_rows = se.routed_lookup(params["linear"]["table"], routing, AXIS,
                                    out_dtype=jnp.float32,
                                    assume_no_overflow=no_ovf
                                    ).reshape(b_loc, f, 1)
    else:
        lin_rows = None

    def loss_fn(dense_params, emb_rows, lin_rows):
        full = merge_dense_params(params, dense_params)
        if fm:
            logits = model_lib.forward_from_rows_fm(
                full, emb_rows, dense, mcfg, interaction_fn=interaction_fn)
        else:
            logits = model_lib.forward_from_rows(
                full, emb_rows, lin_rows, dense, mcfg,
                interaction_fn=interaction_fn)
        # global mean logloss: local sum / global batch
        local_sum = jnp.sum(metrics.sigmoid_bce_with_logits(logits, labels))
        global_b = b_loc * jax.lax.axis_size(AXIS)
        return local_sum / global_b, logits

    argnums = (0, 1, 2) if separate_linear else (0, 1)
    grad_fn = jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)
    if separate_linear:
        (loss, logits), (dgrads, demb, dlin) = grad_fn(
            split_dense_params(params), emb_rows, lin_rows)
    else:
        (loss, logits), (dgrads, demb) = grad_fn(
            split_dense_params(params), emb_rows, None)
        dlin = None
    dbg("loss-psum:enter")
    loss = jax.lax.psum(loss, AXIS)

    # dense params: psum grads (loss already divided by global batch)
    dbg("grads-psum:enter")
    dgrads = jax.lax.psum(dgrads, AXIS)
    dbg("grads-psum:exit")
    lrf = schedule_factor(cfg.optim, step_no, cfg.data.num_train_steps)
    tx = make_dense_optimizer(cfg.optim)
    updates, new_dense_opt = tx.update(dgrads, dense_opt_state,
                                       split_dense_params(params))
    new_dense = optax.apply_updates(split_dense_params(params),
                                    scale_updates(updates, lrf))
    new_params = merge_dense_params(params, new_dense)

    # sparse: reverse all-to-all, per-row update local to the shard.
    # grad_return hands back the per-peer buckets (T, C) / (T, C, W);
    # the bucketed update consumes them directly — no re-sort/re-dedup
    # (cross-peer duplicate rows are summed inside the apply kernel).
    dbg("grad-return-a2a:enter")
    row_ids, row_grads = se.grad_return(demb.reshape(-1, w), routing, AXIS,
                                        max_unique=batch_unique)
    dbg("grad-return-a2a:exit")
    new_sparse = dict(sparse_opt_state)
    sk_emb, sk_lin = sr_keys(mcfg.table_dtype, cfg.optim, step_no,
                             cfg.data.seed)
    if sk_emb is not None:
        # decorrelate the shards' stochastic-rounding dither
        shard = jax.lax.axis_index(AXIS)
        sk_emb = jax.random.fold_in(sk_emb, shard)
        sk_lin = jax.random.fold_in(sk_lin, shard)
    new_table, new_sparse["embed"] = bucketed_rowwise_update(
        table_local, sparse_opt_state["embed"], row_ids, row_grads, cfg.optim,
        lr_scale=lrf, sr_key=sk_emb)
    new_params = dict(new_params, embed={"table": new_table})
    if separate_linear:
        lrow_ids, lrow_grads = se.grad_return(
            dlin.reshape(-1, 1).astype(jnp.float32), routing, AXIS,
            max_unique=batch_unique)
        new_lin, new_sparse["linear"] = bucketed_rowwise_update(
            params["linear"]["table"], sparse_opt_state["linear"],
            lrow_ids, lrow_grads, cfg.optim, lr_scale=lrf, sr_key=sk_lin)
        new_params = dict(new_params, linear=dict(new_params["linear"], table=new_lin))

    step_metrics = {
        "loss": loss,
        "overflow": jax.lax.psum(routing.overflow, AXIS),
    }
    return new_params, new_dense_opt, new_sparse, step_metrics


def make_sharded_train_step(cfg: TrainConfig, mesh: Mesh, interaction_fn=None):
    t = mesh.devices.size
    b_glob = cfg.data.batch_size
    n_local = (b_glob // t) * cfg.model.num_fields
    v_pad = _round_up(cfg.model.total_vocab, t)
    capacity = se.pick_capacity(n_local, t, cfg.sharding.id_capacity_factor,
                                rows_per_shard=v_pad // t,
                                max_unique=unique_bound(
                                    cfg.model.vocab_sizes, b_glob // t))

    body = functools.partial(_local_step, cfg=cfg, capacity=capacity,
                             interaction_fn=interaction_fn)

    sh_table = P(AXIS, None)
    repl = P()

    params_spec = {
        "embed": {"table": sh_table},
        "conv": repl, "tower": repl,
    }
    if cfg.model.use_first_order:
        params_spec["linear"] = (
            {"bias": repl} if cfg.model.fused_linear
            else {"table": sh_table, "bias": repl})

    def make_sparse_spec(state):
        return jax.tree.map(lambda x: sh_table if x.ndim == 2 else repl, state)

    def step(state: TrainState, ids, dense, labels):
        sparse_specs = make_sparse_spec(state.sparse_opt_state)
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(params_spec, repl, sparse_specs, repl,
                      P(AXIS), repl if dense is None else P(AXIS), P(AXIS)),
            out_specs=(params_spec, repl, sparse_specs, repl),
            check_vma=False,
        )
        new_params, new_dense_opt, new_sparse, m = fn(
            state.params, state.dense_opt_state, state.sparse_opt_state,
            state.step, ids, dense, labels)
        return TrainState(state.step + 1, new_params, new_dense_opt, new_sparse), m

    return jax.jit(step, donate_argnums=(0,))


def wrap_wire_step(step, wire_spec, mcfg):
    """Jitted (state, wire_dict) variant of a raw sharded (state, ids,
    dense, labels) step: unpack the packed wire batch (data/wire.py) and
    apply field offsets ON DEVICE. The unpack is elementwise along the
    batch axis, so P("data")-sharded wire arrays stay sharded and no
    resharding happens before the shard_map. Shared by the flat and 2D
    (DCN) sharded paths — this closes round 2's raw-downgrade gap where
    the path that needs H2D bandwidth most shipped 2.2x the bytes."""
    from cffm_tpu.data import wire as wire_lib
    from cffm_tpu.models.cffm import field_offsets

    offs = jnp.asarray(field_offsets(mcfg), jnp.int32)[None, :]

    def wire_step(state: TrainState, wire: dict):
        ids_local, dense, labels = wire_lib.unpack(wire, wire_spec)
        return step(state, ids_local + offs, dense, labels)

    return jax.jit(wire_step, donate_argnums=(0,))


def make_sharded_eval_step(cfg: TrainConfig, mesh: Mesh, interaction_fn=None):
    t = mesh.devices.size
    b_glob = cfg.data.batch_size
    n_local = (b_glob // t) * cfg.model.num_fields
    v_pad = _round_up(cfg.model.total_vocab, t)
    eval_unique = unique_bound(cfg.model.vocab_sizes, b_glob // t)
    capacity = se.pick_capacity(n_local, t, cfg.sharding.id_capacity_factor,
                                rows_per_shard=v_pad // t,
                                max_unique=eval_unique)
    mcfg = cfg.model

    def body(params, auc_state, ids, dense, labels, mask):
        b_loc, f = ids.shape
        cdt = jnp.dtype(mcfg.compute_dtype)
        no_ovf = capacity >= min(ids.size, eval_unique)
        routing = se.build_routing(ids.reshape(-1), capacity, AXIS,
                                   rows_per_shard=params["embed"]["table"].shape[0],
                                   max_unique=eval_unique)
        emb_rows = se.routed_lookup(params["embed"]["table"], routing, AXIS,
                                    out_dtype=cdt, assume_no_overflow=no_ovf
                                    ).reshape(b_loc, f, mcfg.table_width)
        lin_rows = None
        if mcfg.use_first_order and not mcfg.fused_linear:
            lin_rows = se.routed_lookup(params["linear"]["table"], routing, AXIS,
                                        out_dtype=jnp.float32,
                                        assume_no_overflow=no_ovf
                                        ).reshape(b_loc, f, 1)
        logits = model_lib.forward_from_rows(
            params, emb_rows, lin_rows, dense, mcfg, interaction_fn=interaction_fn)
        logits = logits + metrics.calibration_offset(cfg.data)
        # each shard updates its local accumulator; merged via psum
        upd = metrics.auc_state_update(
            jax.tree.map(jnp.zeros_like, auc_state), logits, labels,
            mask=mask)
        return jax.tree.map(lambda a, u: a + jax.lax.psum(u, AXIS), auc_state, upd)

    sh_table = P(AXIS, None)
    repl = P()
    params_spec = {"embed": {"table": sh_table}, "conv": repl, "tower": repl}
    if mcfg.use_first_order:
        params_spec["linear"] = (
            {"bias": repl} if mcfg.fused_linear
            else {"table": sh_table, "bias": repl})

    def step(state: TrainState, auc_state, ids, dense, labels, mask=None):
        # mask: 0/1 weights for full-pass eval tail padding (train.py)
        if mask is None:
            mask = jnp.ones_like(labels)
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(params_spec, repl, P(AXIS),
                      repl if dense is None else P(AXIS), P(AXIS), P(AXIS)),
            out_specs=repl,
            check_vma=False,
        )
        return fn(state.params, auc_state, ids, dense, labels, mask)

    return jax.jit(step)
