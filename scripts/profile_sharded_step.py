"""Decompose the sharded train step's 10s pathology on the real chip.

Builds progressively larger fragments of sharded_train._local_step
under shard_map on a 1-device mesh and times each:
  lookup   : build_routing + routed_lookup
  fwd      : + forward_from_rows + loss
  bwd      : + value_and_grad
  dense    : + psum + optax dense update
  gradret  : + grad_return (reverse a2a)
  update   : + rowwise_update (the full step body)
Usage: python scripts/profile_sharded_step.py [batch] [stage ...]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cffm_tpu import metrics
from cffm_tpu.config import get_config
from cffm_tpu.models import cffm as model_lib
from cffm_tpu.models.cffm import field_offsets
from cffm_tpu.optim.rowwise import (bucketed_rowwise_update,
                                    make_dense_optimizer, schedule_factor,
                                    scale_updates, sr_keys)
from cffm_tpu.parallel import sharded_embedding as se
from cffm_tpu.parallel.mesh import make_mesh
from cffm_tpu.parallel.sharded_train import create_sharded_state
from cffm_tpu.train import (default_interaction_fn, merge_dense_params,
                            split_dense_params)
from cffm_tpu.utils.timing import measure_rtt

AXIS = "data"


def main():
    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 8192
    stages = _sys.argv[2:] or ["lookup", "fwd", "bwd", "dense", "gradret",
                               "update"]
    cfg = get_config("criteo_kaggle")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=batch),
        model=dataclasses.replace(cfg.model, table_dtype="bfloat16"),
        sharding=dataclasses.replace(cfg.sharding, table_sharded=True))
    mcfg = cfg.model
    w = mcfg.table_width
    n = batch * mcfg.num_fields
    capacity = se.pick_capacity(n, 1, cfg.sharding.id_capacity_factor)
    print(f"batch={batch} n_ids={n} capacity={capacity}", flush=True)

    mesh = make_mesh(1)
    state = create_sharded_state(cfg, jax.random.key(0), mesh)
    interaction_fn = default_interaction_fn(cfg)

    rng = np.random.default_rng(0)
    ids_local = np.stack(
        [rng.integers(0, v, size=batch) for v in mcfg.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(mcfg)[None, :].astype(np.int32))
    dense = jnp.asarray(rng.normal(size=(batch, 13)), jnp.float32)
    labels = jnp.asarray((rng.random(batch) < 0.3).astype(np.float32))

    def body(stage, params, dense_opt_state, sparse_opt_state, step_no,
             ids, dense_x, labels):
        b_loc, f = ids.shape
        cdt = jnp.dtype(mcfg.compute_dtype)
        table_local = params["embed"]["table"]
        routing = se.build_routing(ids.reshape(-1), capacity, AXIS)
        emb_rows = se.routed_lookup(table_local, routing, AXIS,
                                    out_dtype=cdt).reshape(b_loc, f, w)
        if stage == "lookup":
            return emb_rows.sum()

        def loss_fn(dense_params, emb_rows):
            full = merge_dense_params(params, dense_params)
            logits = model_lib.forward_from_rows(
                full, emb_rows, None, dense_x, mcfg,
                interaction_fn=interaction_fn)
            local_sum = jnp.sum(metrics.sigmoid_bce_with_logits(logits, labels))
            return local_sum / (b_loc * jax.lax.axis_size(AXIS)), logits

        if stage == "fwd":
            loss, _ = loss_fn(split_dense_params(params), emb_rows)
            return loss
        (loss, _), (dgrads, demb) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                split_dense_params(params), emb_rows)
        if stage == "bwd":
            return loss + sum(jax.tree.leaves(jax.tree.map(jnp.sum, dgrads))) \
                + demb.sum()
        dgrads = jax.lax.psum(dgrads, AXIS)
        lrf = schedule_factor(cfg.optim, step_no, cfg.data.num_train_steps)
        tx = make_dense_optimizer(cfg.optim)
        updates, new_dense_opt = tx.update(dgrads, dense_opt_state,
                                           split_dense_params(params))
        import optax
        new_dense = optax.apply_updates(split_dense_params(params),
                                        scale_updates(updates, lrf))
        if stage == "dense":
            return loss + sum(jax.tree.leaves(jax.tree.map(jnp.sum, new_dense)))
        row_ids, row_grads = se.grad_return(demb.reshape(-1, w), routing, AXIS)
        if stage == "gradret":
            return loss + row_ids.sum() + row_grads.sum()
        sk_emb, _ = sr_keys(mcfg.table_dtype, cfg.optim, step_no,
                            cfg.data.seed)
        if sk_emb is not None:
            sk_emb = jax.random.fold_in(sk_emb, jax.lax.axis_index(AXIS))
        new_table, _ = bucketed_rowwise_update(
            table_local, sparse_opt_state["embed"], row_ids, row_grads,
            cfg.optim, lr_scale=lrf, sr_key=sk_emb)
        return loss + new_table.sum().astype(jnp.float32)

    repl = P()
    sh_table = P(AXIS, None)
    params_spec = {"embed": {"table": sh_table}, "conv": repl, "tower": repl,
                   "linear": {"bias": repl}}
    sparse_specs = jax.tree.map(
        lambda x: sh_table if x.ndim == 2 else repl,
        state.sparse_opt_state)

    rtt = measure_rtt()
    if "trace" in stages:
        import tempfile

        from cffm_tpu.parallel.sharded_train import make_sharded_train_step
        from cffm_tpu.utils.profiling import trace
        sys_mod = _sys
        sys_mod.path.insert(0, _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__))))
        from trace_step import report
        step = make_sharded_train_step(cfg, mesh, interaction_fn)
        state, m = step(state, ids, dense, labels)
        _ = float(m["loss"])
        log_dir = tempfile.mkdtemp(prefix="cffm_shtrace_")
        with trace(log_dir):
            state, m = step(state, ids, dense, labels)
            _ = float(m["loss"])
        report(log_dir, 1, min_ms=2.0)
        return
    if "real" in stages:
        from cffm_tpu.parallel.sharded_train import make_sharded_train_step
        step = make_sharded_train_step(cfg, mesh, interaction_fn)
        t0 = time.time()
        state, m = step(state, ids, dense, labels)
        _ = float(m["loss"])
        print(f"real: compile+1 {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        N = 2
        for _ in range(N):
            state, m = step(state, ids, dense, labels)
        _ = float(m["loss"])
        dt = (time.time() - t0 - rtt) / N
        print(f"real: {dt * 1000:.1f} ms", flush=True)
        stages = [s for s in stages if s != "real"]
    for stage in stages:
        fn = jax.jit(shard_map(
            functools.partial(body, stage), mesh=mesh,
            in_specs=(params_spec, repl, sparse_specs, repl,
                      P(AXIS), P(AXIS), P(AXIS)),
            out_specs=P(), check_vma=False))
        args = (state.params, state.dense_opt_state, state.sparse_opt_state,
                state.step, ids, dense, labels)
        t0 = time.time()
        fn(*args).block_until_ready()
        compile_t = time.time() - t0
        t0 = time.time()
        N = 2
        for _ in range(N):
            r = fn(*args)
        r.block_until_ready()
        dt = (time.time() - t0 - rtt) / N
        print(f"{stage}: {dt * 1000:.1f} ms  (compile {compile_t:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
