"""Decompose criteo_kaggle train-step time on the real chip.

Usage: python scripts/profile_step.py <stage> [batch]
Stages: lookup fwd fwdbwd sparse full
Run each stage in a fresh process (clean HBM) and compare.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import functools
import sys


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.config import get_config
    from cffm_tpu.models import cffm as model_lib
    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update
    from cffm_tpu.train import (create_state, default_interaction_fn,
                                split_dense_params, train_step)
    from cffm_tpu.utils.timing import device_time, measure_rtt

    cfg = get_config("criteo_kaggle")
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, batch_size=batch))
    mcfg = cfg.model

    rng = np.random.default_rng(0)
    ids_local = np.stack(
        [rng.integers(0, v, size=batch) for v in mcfg.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(mcfg)[None, :].astype(np.int32))
    dense = jnp.asarray(rng.normal(size=(batch, 13)), jnp.float32)
    labels = jnp.asarray((rng.random(batch) < 0.3).astype(np.float32))
    interaction_fn = default_interaction_fn(cfg)
    rtt = measure_rtt()

    if stage == "full":
        state = create_state(cfg, jax.random.key(0))
        state, _ = train_step(state, ids, dense, labels, cfg, interaction_fn)
        import time
        n = 10
        t0 = time.time()
        for _ in range(n):
            state, m = train_step(state, ids, dense, labels, cfg, interaction_fn)
        _ = float(m["loss"])
        dt = max(time.time() - t0 - rtt, 1e-9) / n
    elif stage == "lookup":
        table = 0.01 * jax.random.normal(
            jax.random.key(0), (mcfg.total_vocab, mcfg.table_width), jnp.float32)

        @jax.jit
        def f(table, ids):
            rows, _ = model_lib.embedding_lookup({"embed": {"table": table}}, ids, mcfg)
            return jnp.sum(rows.astype(jnp.float32))

        dt = device_time(f, table, ids, n=10, rtt=rtt)
    elif stage == "fwd":
        params = model_lib.init_params(jax.random.key(0), mcfg)

        @jax.jit
        def f(params, ids, dense):
            return jnp.sum(model_lib.forward(params, ids, dense, mcfg,
                                             interaction_fn=interaction_fn))

        dt = device_time(f, params, ids, dense, n=10, rtt=rtt)
    elif stage == "fwdbwd":
        params = model_lib.init_params(jax.random.key(0), mcfg)
        from cffm_tpu import metrics

        def loss_fn(dense_params, emb_rows, params):
            from cffm_tpu.train import merge_dense_params
            full = merge_dense_params(params, dense_params)
            logits = model_lib.forward_from_rows(
                full, emb_rows, None, dense, mcfg, interaction_fn=interaction_fn)
            return metrics.logloss(logits, labels)

        @jax.jit
        def f(params, ids):
            emb_rows, _ = model_lib.embedding_lookup(params, ids, mcfg)
            emb_rows = emb_rows.astype(jnp.dtype(mcfg.compute_dtype))
            (loss), (dg, demb) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                split_dense_params(params), emb_rows, params)
            return loss, jnp.sum(demb.astype(jnp.float32)), jax.tree.map(jnp.sum, dg)

        dt = device_time(f, params, ids, n=10, rtt=rtt)
    elif stage == "sparse":
        table = 0.01 * jax.random.normal(
            jax.random.key(0), (mcfg.total_vocab, mcfg.table_width), jnp.float32)
        st = rowwise_init(table, cfg.optim)
        grads = jax.random.normal(
            jax.random.key(1), (batch * mcfg.num_fields, mcfg.table_width),
            jnp.dtype(mcfg.compute_dtype)) * 0.01

        from cffm_tpu.optim.rowwise import unique_bound

        mu = unique_bound(mcfg.vocab_sizes, batch)
        offs = tuple(int(o) for o in field_offsets(mcfg))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(table, st, flat_ids, grads):
            return rowwise_update(table, st, flat_ids, grads, cfg.optim,
                                  max_unique=mu, field_offsets=offs)

        flat_ids = ids.reshape(-1)
        import time
        new_table, new_st = f(table, st, flat_ids, grads)
        _ = float(jnp.sum(new_st["accum"]))
        n = 10
        t0 = time.time()
        for _ in range(n):
            new_table, new_st = f(new_table, new_st, flat_ids, grads)
        _ = float(jnp.sum(new_st["accum"]))
        dt = max(time.time() - t0 - rtt, 1e-9) / n
    else:
        raise SystemExit(f"unknown stage {stage}")

    print(f"stage={stage} batch={batch} dt={dt*1e3:.2f}ms "
          f"rate={batch/dt/1e3:.1f}K ex/s rtt={rtt*1e3:.1f}ms")


if __name__ == "__main__":
    main()
