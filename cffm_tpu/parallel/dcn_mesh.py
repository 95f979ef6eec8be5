"""DCN-aware 2D mesh: tables sharded INSIDE hosts, replicated across.

SURVEY.md M5 asks for both table placements so they can be measured:

- flat/global (parallel/sharded_train.py): one axis over all devices;
  the lookup all-to-all crosses DCN. Exchange payload per step is
  O(batch·fields·width) — small; this is the DLRM default.
- intra-host (this module): mesh ("host", "chip"); table rows are
  mod-sharded over the host's chips only and REPLICATED across hosts,
  so the lookup all-to-all rides ICI exclusively. The price: table
  replicas must see every host's gradients, paid as one dense
  shard-sized psum over "host" per step — O(shard_rows·width) over
  DCN. Wins only when the touched-row volume approaches the shard size
  or DCN latency (not bandwidth) dominates the small exchange.

Semantics: per-row Adagrad/SGD in dense form (optim.rowwise.
dense_rowwise_apply) — bit-equal to the sparse path for touched rows,
exact no-op for untouched rows.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cffm_tpu import metrics
from cffm_tpu.config import TrainConfig
from cffm_tpu.models import cffm as model_lib
from cffm_tpu.optim.rowwise import (dense_rowwise_apply, make_dense_optimizer,
                                    scale_updates, schedule_factor, sr_keys,
                                    rowwise_init, unique_bound)
from cffm_tpu.parallel import sharded_embedding as se
from cffm_tpu.train import TrainState, merge_dense_params, split_dense_params

HOST, CHIP = "host", "chip"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_mesh_2d(num_hosts: Optional[int] = None,
                 chips_per_host: Optional[int] = None) -> Mesh:
    """("host", "chip") mesh. Defaults to the process topology; tests
    pass explicit shapes to split virtual devices into a grid."""
    devices = jax.devices()
    h = num_hosts or max(jax.process_count(), 1)
    c = chips_per_host or len(devices) // h
    grid = np.asarray(devices[: h * c]).reshape(h, c)
    return Mesh(grid, (HOST, CHIP))


def create_sharded_state_2d(cfg: TrainConfig, rng: jax.Array,
                            mesh: Mesh) -> TrainState:
    """Tables mod-sharded over "chip" (replicated over "host")."""
    c = mesh.shape[CHIP]
    mcfg = cfg.model
    v_pad = _round_up(mcfg.total_vocab, c)

    params = model_lib.init_params(rng, mcfg, skip_tables=True)
    k1, k2 = jax.random.split(rng)
    tdt = jnp.dtype(mcfg.table_dtype)
    table = (0.01 * jax.random.normal(k1, (v_pad, mcfg.table_width),
                                      dtype=jnp.float32)).astype(tdt)
    params["embed"]["table"] = jax.device_put(
        table, NamedSharding(mesh, P(CHIP, None)))
    if mcfg.use_first_order and not mcfg.fused_linear:
        lin = (0.01 * jax.random.normal(k2, (v_pad, 1),
                                        dtype=jnp.float32)).astype(tdt)
        params["linear"]["table"] = jax.device_put(
            lin, NamedSharding(mesh, P(CHIP, None)))

    repl = NamedSharding(mesh, P())
    params["conv"] = jax.device_put(params["conv"], repl)
    params["tower"] = jax.device_put(params["tower"], repl)
    if mcfg.use_first_order:
        params["linear"]["bias"] = jax.device_put(params["linear"]["bias"], repl)

    tx = make_dense_optimizer(cfg.optim)
    dense_opt_state = jax.device_put(tx.init(split_dense_params(params)), repl)

    sharded = NamedSharding(mesh, P(CHIP, None))
    sparse = {"embed": jax.tree.map(
        lambda x: jax.device_put(x, sharded if x.ndim == 2 else repl),
        rowwise_init(params["embed"]["table"], cfg.optim))}
    if mcfg.use_first_order and not mcfg.fused_linear:
        sparse["linear"] = jax.tree.map(
            lambda x: jax.device_put(x, sharded if x.ndim == 2 else repl),
            rowwise_init(params["linear"]["table"], cfg.optim))

    # replicated ON THE MESH — a bare scalar's empty sharding differs
    # from the step output's mesh-attached sharding and forces a full
    # retrace+recompile on call #1 (see sharded_train.create_sharded_state).
    step0 = jax.device_put(jnp.zeros((), jnp.int32), repl)
    return TrainState(step0, params, dense_opt_state, sparse)


def _dense_table_grad(row_ids, row_grads, vs: int):
    """Scatter returned row-grad buckets (T, C)/(T, C, W) into a dense
    (Vs, W) shard buffer; out-of-range sentinel slots (>= vs, which
    carry garbage grads — see sharded_embedding.grad_return) drop.
    Duplicate rows (requested by several peers) accumulate — same
    dedup-sum total as the sparse path."""
    w = row_grads.shape[-1]
    ids = row_ids.reshape(-1)
    return jnp.zeros((vs + 1, w), jnp.float32).at[
        jnp.minimum(ids, vs)].add(
        row_grads.reshape(-1, w).astype(jnp.float32), mode="drop")[:vs]


def _local_step_2d(params, dense_opt_state, sparse_opt_state, step_no,
                   ids, dense, labels,
                   *, cfg: TrainConfig, capacity: int, interaction_fn):
    mcfg = cfg.model
    b_loc, f = ids.shape
    w = mcfg.table_width
    cdt = jnp.dtype(mcfg.compute_dtype)
    both = (HOST, CHIP)

    table_local = params["embed"]["table"]
    # field-major flagship path — see sharded_train._local_step
    fm = model_lib.wants_field_major(params, mcfg, interaction_fn)
    flat_ids = ids.T.reshape(-1) if fm else ids.reshape(-1)

    batch_unique = unique_bound(mcfg.vocab_sizes, b_loc)
    no_ovf = capacity >= min(flat_ids.shape[0], batch_unique)
    routing = se.build_routing(  # ICI-only exchange
        flat_ids, capacity, CHIP, rows_per_shard=table_local.shape[0],
        max_unique=batch_unique)
    rows = se.routed_lookup(table_local, routing, CHIP, out_dtype=cdt,
                            assume_no_overflow=no_ovf)
    emb_rows = rows.reshape(f, b_loc, w) if fm else rows.reshape(b_loc, f, w)
    separate_linear = mcfg.use_first_order and not mcfg.fused_linear
    if separate_linear:
        lin_rows = se.routed_lookup(params["linear"]["table"], routing, CHIP,
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
        local_sum = jnp.sum(metrics.sigmoid_bce_with_logits(logits, labels))
        global_b = b_loc * jax.lax.axis_size(HOST) * jax.lax.axis_size(CHIP)
        return local_sum / global_b, logits

    argnums = (0, 1, 2) if separate_linear else (0, 1)
    grad_fn = jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)
    if separate_linear:
        (loss, _logits), (dgrads, demb, dlin) = grad_fn(
            split_dense_params(params), emb_rows, lin_rows)
    else:
        (loss, _logits), (dgrads, demb) = grad_fn(
            split_dense_params(params), emb_rows, None)
        dlin = None
    loss = jax.lax.psum(loss, both)

    lrf = schedule_factor(cfg.optim, step_no, cfg.data.num_train_steps)
    dgrads = jax.lax.psum(dgrads, both)
    tx = make_dense_optimizer(cfg.optim)
    updates, new_dense_opt = tx.update(dgrads, dense_opt_state,
                                       split_dense_params(params))
    new_dense = optax.apply_updates(split_dense_params(params),
                                    scale_updates(updates, lrf))
    new_params = merge_dense_params(params, new_dense)

    # sparse: ICI grad return within the host, then one dense shard-grad
    # psum across hosts so every replica applies the global update
    vs = table_local.shape[0]
    row_ids, row_grads = se.grad_return(demb.reshape(-1, w), routing, CHIP,
                                        max_unique=batch_unique)
    g_dense = jax.lax.psum(_dense_table_grad(row_ids, row_grads, vs), HOST)
    new_sparse = dict(sparse_opt_state)
    sk_emb, sk_lin = sr_keys(mcfg.table_dtype, cfg.optim, step_no,
                             cfg.data.seed)
    if sk_emb is not None:
        # Fold in ONLY the chip index: each host holds a REPLICA of the
        # chip's table shard and applies the identical psum'd dense
        # update — the stochastic-rounding dither must match across
        # hosts or the replicas drift apart.
        chip = jax.lax.axis_index(CHIP)
        sk_emb = jax.random.fold_in(sk_emb, chip)
        sk_lin = jax.random.fold_in(sk_lin, chip)
    new_table, new_sparse["embed"] = dense_rowwise_apply(
        table_local, sparse_opt_state["embed"], g_dense, cfg.optim,
        lr_scale=lrf, sr_key=sk_emb)
    new_params = dict(new_params, embed={"table": new_table})
    if separate_linear:
        lrow_ids, lrow_grads = se.grad_return(
            dlin.reshape(-1, 1).astype(jnp.float32), routing, CHIP,
            max_unique=batch_unique)
        gl_dense = jax.lax.psum(_dense_table_grad(lrow_ids, lrow_grads, vs), HOST)
        new_lin, new_sparse["linear"] = dense_rowwise_apply(
            params["linear"]["table"], sparse_opt_state["linear"], gl_dense,
            cfg.optim, lr_scale=lrf, sr_key=sk_lin)
        new_params = dict(new_params, linear=dict(new_params["linear"],
                                                  table=new_lin))

    step_metrics = {
        "loss": loss,
        "overflow": jax.lax.psum(routing.overflow, both),
    }
    return new_params, new_dense_opt, new_sparse, step_metrics


def make_sharded_train_step_2d(cfg: TrainConfig, mesh: Mesh,
                               interaction_fn=None):
    assert cfg.optim.sparse_optimizer in ("adagrad", "sgd"), (
        "intra-host table sharding uses the dense-form row update; "
        "sparse adam is only available on the global table axis")
    h, c = mesh.shape[HOST], mesh.shape[CHIP]
    b_glob = cfg.data.batch_size
    n_local = (b_glob // (h * c)) * cfg.model.num_fields
    v_pad = _round_up(cfg.model.total_vocab, c)
    capacity = se.pick_capacity(n_local, c, cfg.sharding.id_capacity_factor,
                                rows_per_shard=v_pad // c,
                                max_unique=unique_bound(
                                    cfg.model.vocab_sizes, b_glob // (h * c)))

    body = functools.partial(_local_step_2d, cfg=cfg, capacity=capacity,
                             interaction_fn=interaction_fn)

    sh_table = P(CHIP, None)
    repl = P()
    batch = P((HOST, CHIP))

    params_spec = {"embed": {"table": sh_table}, "conv": repl, "tower": repl}
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
                      batch, repl if dense is None else batch, batch),
            out_specs=(params_spec, repl, sparse_specs, repl),
            check_vma=False,
        )
        new_params, new_dense_opt, new_sparse, m = fn(
            state.params, state.dense_opt_state, state.sparse_opt_state,
            state.step, ids, dense, labels)
        return TrainState(state.step + 1, new_params, new_dense_opt,
                          new_sparse), m

    return jax.jit(step, donate_argnums=(0,))


def make_sharded_eval_step_2d(cfg: TrainConfig, mesh: Mesh,
                              interaction_fn=None):
    h, c = mesh.shape[HOST], mesh.shape[CHIP]
    b_glob = cfg.data.batch_size
    n_local = (b_glob // (h * c)) * cfg.model.num_fields
    v_pad = _round_up(cfg.model.total_vocab, c)
    eval_unique = unique_bound(cfg.model.vocab_sizes, b_glob // (h * c))
    capacity = se.pick_capacity(n_local, c, cfg.sharding.id_capacity_factor,
                                rows_per_shard=v_pad // c,
                                max_unique=eval_unique)
    mcfg = cfg.model
    both = (HOST, CHIP)

    def body(params, auc_state, ids, dense, labels, mask):
        b_loc, f = ids.shape
        cdt = jnp.dtype(mcfg.compute_dtype)
        no_ovf = capacity >= min(ids.size, eval_unique)
        routing = se.build_routing(ids.reshape(-1), capacity, CHIP,
                                   rows_per_shard=params["embed"]["table"].shape[0],
                                   max_unique=eval_unique)
        emb_rows = se.routed_lookup(params["embed"]["table"], routing, CHIP,
                                    out_dtype=cdt, assume_no_overflow=no_ovf
                                    ).reshape(b_loc, f,
                                              mcfg.table_width)
        lin_rows = None
        if mcfg.use_first_order and not mcfg.fused_linear:
            lin_rows = se.routed_lookup(params["linear"]["table"], routing,
                                        CHIP, out_dtype=jnp.float32
                                        ).reshape(b_loc, f, 1)
        logits = model_lib.forward_from_rows(
            params, emb_rows, lin_rows, dense, mcfg,
            interaction_fn=interaction_fn)
        logits = logits + metrics.calibration_offset(cfg.data)
        upd = metrics.auc_state_update(
            jax.tree.map(jnp.zeros_like, auc_state), logits, labels,
            mask=mask)
        return jax.tree.map(lambda a, u: a + jax.lax.psum(u, both),
                            auc_state, upd)

    sh_table = P(CHIP, None)
    repl = P()
    batch = P((HOST, CHIP))
    params_spec = {"embed": {"table": sh_table}, "conv": repl, "tower": repl}
    if mcfg.use_first_order:
        params_spec["linear"] = (
            {"bias": repl} if mcfg.fused_linear
            else {"table": sh_table, "bias": repl})

    def step(state: TrainState, auc_state, ids, dense, labels, mask=None):
        if mask is None:
            mask = jnp.ones_like(labels)
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(params_spec, repl, batch,
                      repl if dense is None else batch, batch, batch),
            out_specs=repl,
            check_vma=False,
        )
        return fn(state.params, auc_state, ids, dense, labels, mask)

    return jax.jit(step)
