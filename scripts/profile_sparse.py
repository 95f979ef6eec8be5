"""Decompose the rowwise sparse-update time. Run one substage per process.

Usage: python scripts/profile_sparse.py <sub> [batch]
Subs: sort gather segsum scatter scatter_dup update
"""

import sys


def main():
    sub = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.config import get_config
    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.utils.timing import device_time, measure_rtt

    cfg = get_config("criteo_kaggle")
    mcfg = cfg.model
    w = mcfg.table_width
    rng = np.random.default_rng(0)
    ids_local = np.stack(
        [rng.integers(0, v, size=batch) for v in mcfg.vocab_sizes], axis=1
    ).astype(np.int32)
    flat_ids = jnp.asarray(
        (ids_local + field_offsets(mcfg)[None, :].astype(np.int32)).reshape(-1))
    n = flat_ids.shape[0]
    grads = jax.random.normal(jax.random.key(1), (n, w), jnp.bfloat16) * 0.01
    rtt = measure_rtt()

    if sub == "sort":
        @jax.jit
        def f(ids):
            order = jnp.argsort(ids)
            return jnp.sum(order)
        dt = device_time(f, flat_ids, n=10, rtt=rtt)
    elif sub == "gather":
        order = jnp.argsort(flat_ids)
        @jax.jit
        def f(grads, order):
            return jnp.sum(grads[order].astype(jnp.float32))
        dt = device_time(f, grads, order, n=10, rtt=rtt)
    elif sub == "segsum":
        order = jnp.argsort(flat_ids)
        sid = flat_ids[order]
        is_first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
        seg = jnp.cumsum(is_first) - 1
        sgrad = grads[order]
        @jax.jit
        def f(sgrad, seg):
            s = jax.ops.segment_sum(sgrad.astype(jnp.float32), seg,
                                    num_segments=n, indices_are_sorted=True)
            return jnp.sum(s)
        dt = device_time(f, sgrad, seg, n=10, rtt=rtt)
    elif sub in ("scatter", "scatter_dup"):
        table = 0.01 * jax.random.normal(
            jax.random.key(0), (mcfg.total_vocab, w), jnp.float32)
        import functools
        if sub == "scatter":
            # fake "unique" ids: arange-clamped so hints are truthful
            uids = jnp.minimum(
                jnp.arange(n, dtype=jnp.int32), mcfg.total_vocab - 1)
            @functools.partial(jax.jit, donate_argnums=(0,))
            def f(table, uids, grads):
                return table.at[uids].add(
                    grads.astype(jnp.float32), mode="drop",
                    unique_indices=True, indices_are_sorted=True)
        else:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def f(table, uids, grads):
                return table.at[uids].add(grads.astype(jnp.float32), mode="drop")
            uids = flat_ids
        import time
        out = f(table, uids, grads)
        out.block_until_ready()
        t0 = time.time()
        for _ in range(10):
            out = f(out, uids, grads)
        _ = float(out[0, 0])
        dt = max(time.time() - t0 - rtt, 1e-9) / 10
    elif sub == "update":
        from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update
        table = 0.01 * jax.random.normal(
            jax.random.key(0), (mcfg.total_vocab, w), jnp.float32)
        st = rowwise_init(table, cfg.optim)

        @jax.jit
        def f(table, st, flat_ids, grads):
            return rowwise_update(table, st, flat_ids, grads, cfg.optim)
        import time
        table, st = f(table, st, flat_ids, grads)
        _ = float(jnp.sum(st["accum"]))
        t0 = time.time()
        for _ in range(10):
            table, st = f(table, st, flat_ids, grads)
        _ = float(jnp.sum(st["accum"]))
        dt = max(time.time() - t0 - rtt, 1e-9) / 10
    else:
        raise SystemExit(sub)

    print(f"sub={sub} batch={batch} n={n} dt={dt*1e3:.2f}ms rtt={rtt*1e3:.1f}ms")


if __name__ == "__main__":
    main()
