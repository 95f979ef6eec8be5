"""Training/eval loops: jit-compiled step, logloss, AUC eval.

Hot path per SURVEY.md §4.1. The embedding tables are NOT differentiated
through autodiff end-to-end: the step takes grads w.r.t. the *looked-up
rows* (activations) and applies the per-row sparse optimizer directly —
the TPU-idiomatic route that avoids materializing dense table-sized
gradients. Dense params (conv/tower + linear bias) use optax.

Single-chip / replicated-table path here; the row-sharded path lives in
cffm_tpu/parallel/ and plugs in via the same TrainState contract.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import math
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cffm_tpu import metrics
from cffm_tpu.config import TrainConfig
from cffm_tpu.models import cffm as model_lib
from cffm_tpu.optim.rowwise import (make_dense_optimizer, rowwise_init,
                                    scale_updates, schedule_factor, sr_keys,
                                    rowwise_update, unique_bound)


class TrainState(NamedTuple):
    step: jax.Array
    params: Dict[str, Any]  # full model params (embed/linear tables included)
    dense_opt_state: Any  # optax state over the dense sub-tree
    sparse_opt_state: Dict[str, Any]  # {"embed": ..., "linear": ...}


def split_dense_params(params: Dict) -> Dict:
    """The sub-tree optimized by optax (everything but the big tables)."""
    dense = {"conv": params["conv"], "tower": params["tower"]}
    if "linear" in params:
        dense["linear_bias"] = params["linear"]["bias"]
    return dense


def merge_dense_params(params: Dict, dense: Dict) -> Dict:
    out = dict(params)
    out["conv"] = dense["conv"]
    out["tower"] = dense["tower"]
    if "linear_bias" in dense:
        out["linear"] = dict(params["linear"], bias=dense["linear_bias"])
    return out


def create_state(cfg: TrainConfig, rng: jax.Array) -> TrainState:
    params = model_lib.init_params(rng, cfg.model)
    tx = make_dense_optimizer(cfg.optim)
    dense_opt_state = tx.init(split_dense_params(params))
    sparse = {"embed": rowwise_init(params["embed"]["table"], cfg.optim)}
    if cfg.model.use_first_order and not cfg.model.fused_linear:
        sparse["linear"] = rowwise_init(params["linear"]["table"], cfg.optim)
    return TrainState(jnp.zeros((), jnp.int32), params, dense_opt_state, sparse)


def _loss_from_rows(dense_params, emb_rows, lin_rows, batch_dense, labels, params, cfg,
                    interaction_fn):
    full = merge_dense_params(params, dense_params)
    logits = model_lib.forward_from_rows(
        full, emb_rows, lin_rows, batch_dense, cfg.model, interaction_fn=interaction_fn
    )
    return metrics.logloss(logits, labels), logits


def _loss_from_rows_fm(dense_params, emb3, batch_dense, labels, params, cfg,
                       interaction_fn):
    full = merge_dense_params(params, dense_params)
    logits = model_lib.forward_from_rows_fm(
        full, emb3, batch_dense, cfg.model, interaction_fn=interaction_fn
    )
    return metrics.logloss(logits, labels), logits


def _loss_fm_hybrid(dense_params, table_small, emb3_big, ids_small,
                    batch_dense, labels, params, cfg, interaction_fn):
    """fm loss with the small-field one-hot lookup INSIDE the
    differentiated region: grads w.r.t. table_small come back DENSE
    (small_rows, W) — already dedup-summed by the matmul transpose —
    while the big fields keep the rows-as-activations route."""
    mcfg = cfg.model
    cdt = jnp.dtype(mcfg.compute_dtype)
    emb3_small = model_lib.onehot_lookup_fm(table_small, ids_small, mcfg,
                                            out_dtype=cdt)
    full = merge_dense_params(params, dense_params)
    logits = model_lib.forward_from_rows_fm2(
        full, emb3_small, emb3_big, batch_dense, mcfg,
        interaction_fn=interaction_fn)
    return metrics.logloss(logits, labels), logits


@functools.partial(jax.jit, static_argnames=("cfg", "interaction_fn"), donate_argnums=(0,))
def train_step(
    state: TrainState,
    ids: jax.Array,
    dense: Optional[jax.Array],
    labels: jax.Array,
    cfg: TrainConfig,
    interaction_fn=None,
):
    """One SGD step. Returns (new_state, metrics dict)."""
    params = state.params
    mcfg = cfg.model
    # Field-major fast path (flagship): transpose ids BEFORE the gather
    # so the looked-up rows land in the layout the fm kernel and the
    # per-field sort consume directly — no (B*F,W)<->(B,F*W) retiling.
    fm = model_lib.wants_field_major(params, mcfg, interaction_fn)
    # Hybrid small-field path: leading small-vocab fields via one-hot
    # MXU lookup + dense per-row update (their ids skip the gather AND
    # the sort/dedup/scatter pipeline); dense-form update exists for
    # adagrad/sgd only (optim.rowwise.dense_rowwise_apply).
    fs = (mcfg.small_field_prefix
          if fm and cfg.optim.sparse_optimizer in ("adagrad", "sgd") else 0)
    dtab_small = None
    if fm:
        ids_fm = ids.T  # (F, B)
        if fs:
            table_small = params["embed"]["table"][: mcfg.small_rows]
            if fs < mcfg.num_fields:
                emb3_big = model_lib.embedding_lookup_fm(
                    params, ids_fm[fs:], mcfg
                ).astype(jnp.dtype(mcfg.compute_dtype))
                (loss, logits), (dgrads, dtab_small, demb) = (
                    jax.value_and_grad(
                        _loss_fm_hybrid, argnums=(0, 1, 2), has_aux=True)(
                        split_dense_params(params), table_small, emb3_big,
                        ids_fm[:fs], dense, labels, params, cfg,
                        interaction_fn))
            else:
                # every field is small: no gather, no sparse path
                (loss, logits), (dgrads, dtab_small) = jax.value_and_grad(
                    _loss_fm_hybrid, argnums=(0, 1), has_aux=True)(
                    split_dense_params(params), table_small, None,
                    ids_fm, dense, labels, params, cfg, interaction_fn)
                demb = None
        else:
            emb3 = model_lib.embedding_lookup_fm(params, ids_fm, mcfg)
            emb3 = emb3.astype(jnp.dtype(mcfg.compute_dtype))
            (loss, logits), (dgrads, demb) = jax.value_and_grad(
                _loss_from_rows_fm, argnums=(0, 1), has_aux=True)(
                split_dense_params(params), emb3, dense, labels, params, cfg,
                interaction_fn,
            )
        dlin = None
        separate_linear = False
    else:
        emb_rows, lin_rows = model_lib.embedding_lookup(params, ids, mcfg)
        # Cast rows to the compute dtype HERE so the row grads (demb)
        # come back narrow too — halves the dedup-sort/scatter traffic.
        emb_rows = emb_rows.astype(jnp.dtype(mcfg.compute_dtype))

        separate_linear = mcfg.use_first_order and not mcfg.fused_linear
        grad_fn = jax.value_and_grad(
            _loss_from_rows, argnums=(0, 1, 2) if separate_linear else (0, 1),
            has_aux=True,
        )
        if separate_linear:
            (loss, logits), (dgrads, demb, dlin) = grad_fn(
                split_dense_params(params), emb_rows, lin_rows, dense, labels,
                params, cfg, interaction_fn,
            )
        else:
            (loss, logits), (dgrads, demb) = grad_fn(
                split_dense_params(params), emb_rows, None, dense, labels,
                params, cfg, interaction_fn,
            )
            dlin = None

    # Dense update (optax), scaled by the LR schedule.
    lrf = schedule_factor(cfg.optim, state.step, cfg.data.num_train_steps)
    tx = make_dense_optimizer(cfg.optim)
    updates, new_dense_opt = tx.update(dgrads, state.dense_opt_state,
                                       split_dense_params(params))
    new_dense = optax.apply_updates(split_dense_params(params),
                                    scale_updates(updates, lrf))
    new_params = merge_dense_params(params, new_dense)

    # Sparse per-row updates on the touched rows.
    new_sparse = dict(state.sparse_opt_state)
    # mask_sentinels=False: the single-host data layer hashes ids
    # in-range, so the sentinel-zeroing pass over the 1.6 GB grad block
    # is dead weight here (the sharded engine keeps masking on).
    offs = tuple(int(o) for o in model_lib.field_offsets(mcfg))
    sk_emb, sk_lin = sr_keys(mcfg.table_dtype, cfg.optim, state.step,
                             cfg.data.seed)
    if fs:
        # big fields only through the sort/dedup/scatter pipeline
        if demb is not None:
            max_u = unique_bound(mcfg.vocab_sizes[fs:], ids.shape[0])
            new_table, new_sparse["embed"] = rowwise_update(
                new_params["embed"]["table"],
                state.sparse_opt_state["embed"],
                ids_fm[fs:].reshape(-1),
                demb.reshape(-1, mcfg.table_width), cfg.optim,
                max_unique=max_u, field_offsets=offs[fs:],
                mask_sentinels=False, lr_scale=lrf, sr_key=sk_emb,
                field_major=True,
            )
        else:
            new_table = new_params["embed"]["table"]
            new_sparse["embed"] = dict(state.sparse_opt_state["embed"])
        # small block: dense per-row update on the table prefix (its
        # rows [0, small_rows) are disjoint from every big-field id)
        srows = mcfg.small_rows
        from cffm_tpu.optim.rowwise import dense_rowwise_apply

        small_state = {
            k: (v[:srows] if getattr(v, "ndim", 0) >= 1
                and v.shape[0] == new_table.shape[0] else v)
            for k, v in new_sparse["embed"].items()}
        sk_small = None if sk_emb is None else jax.random.fold_in(sk_emb, 1)
        new_small, new_small_state = dense_rowwise_apply(
            new_table[:srows], small_state, dtab_small, cfg.optim,
            lr_scale=lrf, sr_key=sk_small)
        new_table = new_table.at[:srows].set(new_small)
        for k, v in new_small_state.items():
            full = new_sparse["embed"][k]
            if (getattr(v, "ndim", 0) >= 1
                    and full.shape[0] == new_table.shape[0]):
                new_sparse["embed"][k] = full.at[:srows].set(v)
    else:
        flat_ids = ids_fm.reshape(-1) if fm else ids.reshape(-1)
        max_u = unique_bound(mcfg.vocab_sizes, ids.shape[0])
        new_table, new_sparse["embed"] = rowwise_update(
            new_params["embed"]["table"], state.sparse_opt_state["embed"],
            flat_ids, demb.reshape(-1, mcfg.table_width), cfg.optim,
            max_unique=max_u, field_offsets=offs, mask_sentinels=False,
            lr_scale=lrf, sr_key=sk_emb, field_major=fm,
        )
    new_params = dict(new_params, embed={"table": new_table})
    if separate_linear:
        new_lin, new_sparse["linear"] = rowwise_update(
            new_params["linear"]["table"], state.sparse_opt_state["linear"],
            flat_ids, dlin.reshape(-1, 1), cfg.optim, max_unique=max_u,
            field_offsets=offs, mask_sentinels=False, lr_scale=lrf,
            sr_key=sk_lin,
        )
        new_params = dict(new_params, linear=dict(new_params["linear"], table=new_lin))

    new_state = TrainState(state.step + 1, new_params, new_dense_opt, new_sparse)
    step_metrics = {
        "loss": loss,
        "logit_mean": jnp.mean(logits),
    }
    return new_state, step_metrics


@functools.partial(jax.jit, static_argnames=("spec", "cfg", "interaction_fn"),
                   donate_argnums=(0,))
def train_step_wire(state: TrainState, wire: dict, spec, cfg: TrainConfig,
                    interaction_fn=None):
    """train_step on a packed wire batch (data/wire.py): unpack the
    narrow-dtype arrays and apply field offsets ON DEVICE, then run the
    normal step. Exists because the H2D link is bandwidth-bound and
    serializes with compute (scripts/probe_h2d.py) — shipping ~2.2x
    fewer bytes is worth a few VPU shifts per batch."""
    from cffm_tpu.data import wire as wire_lib

    ids_local, dense, labels = wire_lib.unpack(wire, spec)
    offs = jnp.asarray(model_lib.field_offsets(cfg.model),
                       jnp.int32)[None, :]
    return train_step(state, ids_local + offs, dense, labels, cfg,
                      interaction_fn)


@functools.partial(jax.jit, static_argnames=("cfg", "interaction_fn"))
def eval_step(state: TrainState, auc_state, ids, dense, labels, cfg: TrainConfig,
              interaction_fn=None, mask=None):
    logits = model_lib.forward(state.params, ids, dense, cfg.model,
                               interaction_fn=interaction_fn)
    logits = logits + metrics.calibration_offset(cfg.data)
    return metrics.auc_state_update(auc_state, logits, labels, mask=mask)


def evaluate(state: TrainState, batches, cfg: TrainConfig, interaction_fn=None) -> Dict:
    auc_state = metrics.auc_state_init()
    for batch in batches:
        auc_state = eval_step(
            state, auc_state, jnp.asarray(batch["ids"]),
            None if batch["dense"] is None else jnp.asarray(batch["dense"]),
            jnp.asarray(batch["labels"]), cfg, interaction_fn,
        )
    out = metrics.auc_state_finalize(auc_state)
    return {k: float(v) for k, v in out.items()}


def default_interaction_fn(cfg: TrainConfig):
    """The fused Pallas path when enabled; None -> jnp reference."""
    if cfg.model.use_pallas and cfg.model.conv_channels:
        from cffm_tpu.ops.interaction_conv import make_interaction_fn

        return make_interaction_fn(use_pallas=True)
    return None


def run(cfg: TrainConfig, interaction_fn=None, log_fn=print,
        preemption_guard=None) -> Dict:
    """Full train-then-eval for one config.

    Dispatches between the replicated single-device path and the
    row-sharded SPMD path (cfg.sharding.table_sharded + >1 device).
    preemption_guard: optional utils.preemption.PreemptionGuard (a
    default SIGTERM guard is installed when None): on signal, all
    hosts agree on a stop step, save a final checkpoint, run the
    normal eval, and return with result["preempted_at_step"] set.
    """
    from cffm_tpu.data.loader import make_dataset

    if interaction_fn is None:
        interaction_fn = default_interaction_fn(cfg)

    use_sharded = cfg.sharding.table_sharded and jax.device_count() > 1
    rng = jax.random.key(cfg.data.seed)
    wire_spec = None
    if cfg.data.wire_format == "packed":
        from cffm_tpu.data import wire as wire_lib
        wire_spec = wire_lib.spec_for_model(cfg.model)

    if use_sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cffm_tpu.parallel.mesh import make_mesh
        from cffm_tpu.parallel.sharded_train import (
            AXIS, create_sharded_state, make_sharded_eval_step,
            make_sharded_train_step)

        if cfg.sharding.table_axis == "intra_host":
            from cffm_tpu.parallel.dcn_mesh import (
                create_sharded_state_2d, make_mesh_2d,
                make_sharded_eval_step_2d, make_sharded_train_step_2d)

            mesh = make_mesh_2d()
            state = create_sharded_state_2d(cfg, rng, mesh)
            step_fn = make_sharded_train_step_2d(cfg, mesh, interaction_fn)
            eval_fn = make_sharded_eval_step_2d(cfg, mesh, interaction_fn)
        elif cfg.sharding.table_axis == "hier":
            from cffm_tpu.parallel.dcn_mesh import make_mesh_2d
            from cffm_tpu.parallel.sharded_train import (
                make_sharded_eval_step_hier, make_sharded_train_step_hier)

            mesh = make_mesh_2d()
            state = create_sharded_state(
                cfg, rng, mesh, table_pspec=P(("host", "chip"), None))
            step_fn = make_sharded_train_step_hier(cfg, mesh, interaction_fn)
            eval_fn = make_sharded_eval_step_hier(cfg, mesh, interaction_fn)
        else:
            mesh = make_mesh()
            state = create_sharded_state(cfg, rng, mesh)
            step_fn = make_sharded_train_step(cfg, mesh, interaction_fn)
            eval_fn = make_sharded_eval_step(cfg, mesh, interaction_fn)
        if wire_spec is not None:
            from cffm_tpu.parallel.sharded_train import wrap_wire_step
            wire_step_fn = wrap_wire_step(step_fn, wire_spec, cfg.model)
        if jax.process_count() > 1:
            # multi-host: assemble global batch arrays from per-host
            # shards (SPMD data path, SURVEY.md §4.1)
            batch_axes = (tuple(mesh.axis_names) if len(mesh.axis_names) > 1
                          else AXIS)
            batch_sharding = NamedSharding(mesh, P(batch_axes))

            def to_device(x):
                if x is None:
                    return None
                global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
                return jax.make_array_from_process_local_data(
                    batch_sharding, np.asarray(x), global_shape)
        else:
            def to_device(x):
                return None if x is None else jnp.asarray(x)
    else:
        state = create_state(cfg, rng)

        def step_fn(state, ids, dense, labels):
            return train_step(state, ids, dense, labels, cfg, interaction_fn)

        def eval_fn(state, auc_state, ids, dense, labels, mask=None):
            return eval_step(state, auc_state, ids, dense, labels, cfg,
                             interaction_fn, mask=mask)

        def to_device(x):
            return None if x is None else jnp.asarray(x)

    # checkpoint manager + resume (SURVEY.md §6 checkpoint/resume):
    # restore reshards table storage if the shard count changed, and the
    # dataset below is fast-forwarded past the already-consumed batches.
    ckpt_mgr = None
    start_step = 0
    if not use_sharded:
        num_shards = 1
    elif cfg.sharding.table_axis == "intra_host":
        num_shards = mesh.shape["chip"]  # tables sharded within a host
    else:
        num_shards = jax.device_count()
    if cfg.checkpoint_dir:
        from cffm_tpu.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfg.checkpoint_dir)
        if ckpt_mgr.latest_step() is not None:
            state, meta = ckpt_mgr.restore_auto(state, cfg, num_shards)
            start_step = int(ckpt_mgr.latest_step())
            log_fn(json.dumps({"resumed_from_step": start_step,
                               "checkpoint_meta": meta}))

    ds = make_dataset(cfg, jax.process_index(), jax.process_count(),
                      skip_batches=start_step)
    # persistent repeat-mode val stream for windowed eval; full-pass
    # eval (eval_batches=0 on a real dataset) builds a fresh
    # non-repeat stream per eval instead
    val_ds = (make_dataset(cfg, jax.process_index(), jax.process_count(),
                           split="val")
              if cfg.data.eval_batches > 0 or cfg.data.path is None
              else None)

    def run_eval():
        auc_state = metrics.auc_state_init()
        if cfg.data.eval_batches > 0 or cfg.data.path is None:
            # fixed-size eval window (the synthetic stream is infinite,
            # so a "full pass" is undefined there — bound it)
            for _ in range(cfg.data.eval_batches or 32):
                b = next(val_ds)
                auc_state = eval_fn(
                    state, auc_state, to_device(b["ids"]),
                    to_device(b["dense"]), to_device(b["labels"]),
                )
            return {k: float(v)
                    for k, v in metrics.auc_state_finalize(auc_state).items()}

        # eval_batches == 0: ONE FULL PASS over the held-out split
        # (reference repos report AUC over the entire test set). The
        # final partial batch pads to the static shape with mask=0 rows
        # (exactly zero metric contribution); under multi-host, hosts
        # stay in SPMD lockstep by feeding all-masked batches until
        # every host's stream is exhausted.
        per_host = cfg.data.batch_size // jax.process_count()
        f = cfg.model.num_fields
        it = make_dataset(cfg, jax.process_index(), jax.process_count(),
                          split="val", repeat=False)
        multi = jax.process_count() > 1
        if multi:
            from jax.experimental import multihost_utils
        while True:
            b = next(it, None)
            alive = b is not None
            if multi:
                alive_any = bool(
                    multihost_utils.process_allgather(
                        np.asarray(alive)).any())
            else:
                alive_any = alive
            if not alive_any:
                break
            if b is None:
                ids = np.zeros((per_host, f), np.int32)
                dense = (np.zeros((per_host, cfg.model.num_dense), np.float32)
                         if cfg.model.num_dense else None)
                labels = np.zeros((per_host,), np.float32)
                mask = np.zeros((per_host,), np.float32)
            else:
                n = len(b["labels"])
                pad = per_host - n
                ids, dense, labels = b["ids"], b["dense"], b["labels"]
                mask = np.ones((per_host,), np.float32)
                if pad > 0:
                    # pad rows use id 0 (always a valid table row) —
                    # their logits are computed then zeroed by the mask
                    ids = np.pad(ids, ((0, pad), (0, 0)))
                    labels = np.pad(labels, (0, pad))
                    if dense is not None:
                        dense = np.pad(dense, ((0, pad), (0, 0)))
                    mask[n:] = 0.0
            auc_state = eval_fn(
                state, auc_state, to_device(ids), to_device(dense),
                to_device(labels), to_device(mask))
        return {k: float(v)
                for k, v in metrics.auc_state_finalize(auc_state).items()}

    from cffm_tpu.data.loader import device_prefetch
    from cffm_tpu.utils.preemption import PreemptionGuard
    from cffm_tpu.utils.tb import ScalarWriter

    # Event files only from host 0 (every host computes identical
    # psum'd metrics; duplicate writers would fight over the dir).
    tb = ScalarWriter(cfg.tensorboard_dir if jax.process_index() == 0
                      else None)
    # SIGTERM -> cooperative stop at a step boundary with a final
    # checkpoint (SURVEY.md §6 failure-detection row): preemption
    # costs at most `stop_every` steps of progress instead of
    # everything since the last periodic checkpoint.
    guard = PreemptionGuard() if preemption_guard is None else preemption_guard
    stop_every = cfg.log_every or 50
    preempted_at = None
    dev_ds = device_prefetch(ds, to_device)
    t0 = time.time()
    examples = 0
    last_loss = float("nan")
    for step in range(start_step, cfg.data.num_train_steps):
        item = next(dev_ds)
        if wire_spec is not None:
            if use_sharded:
                state, m = wire_step_fn(state, item)
            else:
                state, m = train_step_wire(state, item, wire_spec, cfg,
                                           interaction_fn)
            examples += int(item["labels"].shape[0])
        else:
            ids, dense, labels = item
            state, m = step_fn(state, ids, dense, labels)
            examples += int(labels.shape[0])
        if cfg.log_every and (step + 1) % cfg.log_every == 0:
            last_loss = float(m["loss"])
            elapsed = time.time() - t0
            rec = {"step": step + 1, "loss": last_loss,
                   "examples_per_s": examples / max(elapsed, 1e-9)}
            if "overflow" in m:
                rec["id_overflow"] = int(m["overflow"])
            log_fn(json.dumps(rec))
            tb.scalars(step + 1, {"train/loss": rec["loss"],
                                  "train/examples_per_s":
                                      rec["examples_per_s"]})
        if cfg.data.eval_every and (step + 1) % cfg.data.eval_every == 0:
            ev = run_eval()
            log_fn(json.dumps({"step": step + 1, "eval": ev}))
            tb.scalars(step + 1, {f"eval/{k}": v for k, v in ev.items()})
        if ckpt_mgr and cfg.checkpoint_every and (step + 1) % cfg.checkpoint_every == 0:
            ckpt_mgr.save(step + 1, state, cfg, num_shards=num_shards)
        if (step + 1) % stop_every == 0 and guard.sync():
            # every host agrees (sync is a collective): stop at the
            # same step, save, and fall through to the normal eval/exit
            preempted_at = step + 1
            if ckpt_mgr:
                ckpt_mgr.save(step + 1, state, cfg, num_shards=num_shards,
                              wait=True)
            log_fn(json.dumps({"preempted_at_step": preempted_at,
                               "checkpoint_saved": bool(ckpt_mgr)}))
            break

    result = run_eval()
    if math.isnan(last_loss) and cfg.data.num_train_steps > start_step:
        # log_every=0 never drains a step's metrics; report the final
        # step's loss instead of a misleading NaN (one D2H readback).
        last_loss = float(m["loss"])
    result["final_train_loss"] = last_loss
    if preempted_at is not None:
        result["preempted_at_step"] = preempted_at
    guard.close()
    log_fn(json.dumps({"eval": result}))
    tb.scalars(cfg.data.num_train_steps,
               {f"eval/{k}": v for k, v in result.items()})
    tb.close()
    if ckpt_mgr:
        if preempted_at is None:
            # a preempted run already saved at its stop step; writing
            # the num_train_steps checkpoint here would make resume
            # believe the run completed
            ckpt_mgr.save(cfg.data.num_train_steps, state, cfg,
                          num_shards=num_shards, wait=True)
        ckpt_mgr.close()
    return result


if __name__ == "__main__":
    from cffm_tpu.cli import main as _main

    import sys as _sys

    _sys.exit(_main())
