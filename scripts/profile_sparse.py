"""Decompose the rowwise sparse-update time. Run one substage per process.

Usage: python scripts/profile_sparse.py <sub> [batch]
Subs: sort gather segsum scatter scatter_dup update
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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
    elif sub == "sortonly":
        @jax.jit
        def f(ids):
            return jnp.sum(jnp.argsort(ids))
        dt = device_time(f, flat_ids, n=10, rtt=rtt)
    elif sub == "sortpf":
        from cffm_tpu.optim.rowwise import _per_field_sort_order
        offs = tuple(int(o) for o in field_offsets(mcfg))

        @jax.jit
        def f(ids):
            return jnp.sum(_per_field_sort_order(ids, offs))
        dt = device_time(f, flat_ids, n=10, rtt=rtt)
    elif sub == "sortgather_pf":
        from cffm_tpu.optim.rowwise import _per_field_sort_order
        offs = tuple(int(o) for o in field_offsets(mcfg))

        @jax.jit
        def f(ids, grads):
            order = _per_field_sort_order(ids, offs)
            return jnp.sum(ids[order]), jnp.sum(
                grads[order].astype(jnp.float32))
        dt = device_time(f, flat_ids, grads, n=10, rtt=rtt)
    elif sub == "gatheronly":
        order = jnp.argsort(flat_ids)

        @jax.jit
        def f(grads, order):
            return jnp.sum(grads[order].astype(jnp.float32))
        dt = device_time(f, grads, order, n=10, rtt=rtt)
    elif sub == "sortgather":
        @jax.jit
        def f(flat_ids, grads):
            order = jnp.argsort(flat_ids)
            return jnp.sum(flat_ids[order]), jnp.sum(
                grads[order].astype(jnp.float32))
        dt = device_time(f, flat_ids, grads, n=10, rtt=rtt)
    elif sub == "segkernel":
        from cffm_tpu.optim.rowwise import unique_bound
        from cffm_tpu.ops.sorted_segment import sorted_segment_sum_compact
        from cffm_tpu.ops.streamed_update import padded_entries, pick_tile

        r = pick_tile(mcfg.total_vocab)
        m_pad = padded_entries(min(n, unique_bound(mcfg.vocab_sizes, batch)), r)
        order = jnp.argsort(flat_ids)
        sid = flat_ids[order]
        sgrad = grads[order]

        @jax.jit
        def f(sid, sgrad):
            uids, gsum, count = sorted_segment_sum_compact(sid, sgrad, m_pad)
            return jnp.sum(gsum), jnp.sum(uids), count
        dt = device_time(f, sid, sgrad, n=10, rtt=rtt)
        print(f"  m_pad={m_pad} r={r}")
    elif sub == "apply":
        import functools

        from cffm_tpu.optim.rowwise import unique_bound
        from cffm_tpu.ops.sorted_segment import sorted_segment_sum_compact
        from cffm_tpu.ops.streamed_update import (padded_entries, pick_tile,
                                                  streamed_rowwise_apply)

        table = 0.01 * jax.random.normal(
            jax.random.key(0), (mcfg.total_vocab, w), jnp.float32)
        accum = jnp.full((mcfg.total_vocab, 1), 0.01, jnp.float32)
        r = pick_tile(mcfg.total_vocab)
        m_pad = padded_entries(min(n, unique_bound(mcfg.vocab_sizes, batch)), r)
        order = jnp.argsort(flat_ids)
        uids, gsum, count = jax.jit(
            lambda s, g: sorted_segment_sum_compact(s, g, m_pad)
        )(flat_ids[order], grads[order])
        uids_s = jnp.where(jnp.arange(m_pad) < count, uids,
                           mcfg.total_vocab).astype(jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(table, accum, uids_s, gsum):
            return streamed_rowwise_apply(
                table, accum, uids_s, gsum, 0.01, 1e-8, r=r)
        import time
        table, accum = f(table, accum, uids_s, gsum)
        _ = float(jnp.sum(accum))
        t0 = time.time()
        for _ in range(10):
            table, accum = f(table, accum, uids_s, gsum)
        _ = float(jnp.sum(accum))
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
