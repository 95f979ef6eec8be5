"""Benchmark: full CFFM training-step throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

Baseline (BASELINE.md): >=1M examples/s on a v5e-8 => 125K examples/s
per chip. vs_baseline = measured_per_chip / 125000.

Measures the complete train step (lookup + fused Pallas cross-conv
fwd/bwd + tower + per-row Adagrad + optax) on the Criteo-Kaggle
flagship config with synthetic data, using the RTT-corrected harness
(cffm_tpu/utils/timing.py — the axon relay's block_until_ready lies).

Resilience: any RESOURCE_EXHAUSTED (or other device error) retries at
half batch, and the JSON line is printed no matter what — a benchmark
that crashes depending on prior device state is not a benchmark
(round-1 lesson: BENCH_r01 was an OOM with zero headroom).
"""

import dataclasses
import json
import sys
import time


def _run_once(batch: int, feed: str = "staged",
              table_dtype: str = "float32",
              config: str = "criteo_kaggle",
              sparse_optimizer: str | None = None) -> float:
    """Train-step examples/s at this batch size (raises on device error).

    feed="staged": synthetic arrays pre-staged on device (pure device
    compute). feed="reader": batches stream from an on-disk criteo TSV
    through the native multi-threaded reader + prefetch thread + H2D
    transfer — the end-to-end number the ≥1M ex/s target is about."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.config import get_config
    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.train import create_state, default_interaction_fn, train_step
    from cffm_tpu.utils.timing import measure_rtt

    cfg = get_config(config)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=batch),
        model=dataclasses.replace(cfg.model, table_dtype=table_dtype))
    if sparse_optimizer:
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim,
                                           sparse_optimizer=sparse_optimizer))

    if feed in ("reader", "prehashed"):
        return _run_reader_fed(cfg, batch, prehashed=(feed == "prehashed"))
    if feed == "score":
        return _run_score(cfg, batch)
    if feed == "sharded":
        return _run_sharded(cfg, batch)

    rng = np.random.default_rng(0)
    ids_local = np.stack(
        [rng.integers(0, v, size=batch) for v in cfg.model.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    dense = (jnp.asarray(rng.normal(size=(batch, cfg.model.num_dense)),
                         jnp.float32) if cfg.model.num_dense else None)
    labels = jnp.asarray((rng.random(batch) < 0.3).astype(np.float32))

    state = create_state(cfg, jax.random.key(0))
    interaction_fn = default_interaction_fn(cfg)

    # train_step is already jit'd WITH state donation — call it directly
    # (an extra non-donating jit wrapper would double the table in HBM).
    state, _ = train_step(state, ids, dense, labels, cfg, interaction_fn)
    rtt = measure_rtt()

    n = 10
    t0 = time.time()
    for _ in range(n):
        state, m = train_step(state, ids, dense, labels, cfg, interaction_fn)
    _ = float(m["loss"])
    total = time.time() - t0
    dt = max(total - rtt, 1e-9) / n
    return batch / dt


def _run_score(cfg, batch: int) -> float:
    """Inference/serving throughput: forward-only logits on staged
    batches (the scoring path, cffm_tpu/score.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.models import cffm as model_lib
    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.train import create_state, default_interaction_fn
    from cffm_tpu.utils.timing import device_time, measure_rtt

    mcfg = cfg.model
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        np.stack([rng.integers(0, v, size=batch) for v in mcfg.vocab_sizes],
                 axis=1).astype(np.int32)
        + field_offsets(mcfg)[None, :].astype(np.int32))
    dense = (jnp.asarray(rng.normal(size=(batch, mcfg.num_dense)), jnp.float32)
             if mcfg.num_dense else None)
    state = create_state(cfg, jax.random.key(0))
    interaction_fn = default_interaction_fn(cfg)

    @jax.jit
    def score(params, ids, dense):
        return model_lib.forward(params, ids, dense, mcfg,
                                 interaction_fn=interaction_fn)

    rtt = measure_rtt()
    dt = device_time(score, state.params, ids, dense, n=10, rtt=rtt)
    return batch / dt


def _run_sharded(cfg, batch: int) -> float:
    """Row-sharded train step on a 1-device mesh (real chip).

    This is the EXACT program the scaled configs run (SURVEY.md §4.1):
    sort-based dedup (3 argsorts over B*F ids), capacity-bucket routing,
    all-to-all x4 (no-op collectives at T=1 but the routing compute is
    fully real), reverse grad exchange, and the per-shard row update.
    The delta vs --feed=staged is the per-chip cost every device pays
    at 8-way scale — the routed path's overhead measured on silicon."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.parallel.mesh import make_mesh
    from cffm_tpu.parallel.sharded_train import (create_sharded_state,
                                                 make_sharded_train_step)
    from cffm_tpu.train import default_interaction_fn
    from cffm_tpu.utils.timing import measure_rtt

    cfg = _dc.replace(
        cfg, sharding=_dc.replace(cfg.sharding, table_sharded=True))

    rng = np.random.default_rng(0)
    ids_local = np.stack(
        [rng.integers(0, v, size=batch) for v in cfg.model.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    dense = (jnp.asarray(rng.normal(size=(batch, cfg.model.num_dense)),
                         jnp.float32) if cfg.model.num_dense else None)
    labels = jnp.asarray((rng.random(batch) < 0.3).astype(np.float32))

    mesh = make_mesh(1)
    state = create_sharded_state(cfg, jax.random.key(0), mesh)
    step = make_sharded_train_step(cfg, mesh, default_interaction_fn(cfg))

    state, _ = step(state, ids, dense, labels)
    rtt = measure_rtt()

    n = 10
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, ids, dense, labels)
    _ = float(m["loss"])
    total = time.time() - t0
    return batch / (max(total - rtt, 1e-9) / n)


def _run_reader_fed(cfg, batch: int, prehashed: bool = False) -> float:
    """Reader-fed variant: real file -> native MT parse -> prefetch ->
    H2D -> train step. Measures the full per-host pipeline.
    prehashed=True converts the TSV to .cfb first and feeds from that
    (the production input path for repeated epochs — parse paid once)."""
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from bench_input import _write_criteo
    from cffm_tpu.data.loader import make_dataset
    from cffm_tpu.train import create_state, default_interaction_fn
    from cffm_tpu.utils.timing import measure_rtt

    n = 10
    rows = (n + 3) * batch
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "criteo.tsv")
        _write_criteo(path, rows)
        if prehashed:
            from cffm_tpu.data.prehash import convert
            cfb = os.path.join(d, "criteo.cfb")
            convert(path, cfb, cfg.model, "criteo", chunk=batch)
            path = cfb
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(
                cfg.data, path=path, dataset="criteo",
                shuffle=prehashed, wire_format="packed"))
        from cffm_tpu.data import wire as wire_lib
        from cffm_tpu.data.loader import device_prefetch
        from cffm_tpu.train import train_step_wire

        spec = wire_lib.spec_for_model(cfg.model)
        ds = make_dataset(cfg, prefetch=4)
        dev_ds = device_prefetch(
            ds, lambda x: None if x is None else jnp.asarray(x))
        interaction_fn = default_interaction_fn(cfg)
        state = create_state(cfg, jax.random.key(0))

        def one_step(state):
            return train_step_wire(state, next(dev_ds), spec, cfg,
                                   interaction_fn)

        state, _ = one_step(state)  # compile + warm the prefetch pipe
        rtt = measure_rtt()
        t0 = time.time()
        for _ in range(n):
            state, m = one_step(state)
        _ = float(m["loss"])
        total = time.time() - t0
    return batch / (max(total - rtt, 1e-9) / n)


_LAST_GOOD = "BENCH_LAST_GOOD.json"


def _lg_key(metric: str, feed: str) -> str:
    # Records are keyed by metric AND feed: every --feed variant prints
    # the same metric name, and a slow feed (or a CPU test run) once
    # silently overwrote the flagship staged number under the shared key.
    return metric if feed == "staged" else f"{metric}:{feed}"


def _record_last_good(out: dict, feed: str) -> None:
    """Persist a successful live TPU measurement next to the repo root.

    CPU-backend runs (e.g. JAX_PLATFORMS=cpu while testing a feed path)
    are never recorded — a last-good entry is a chip number."""
    import os
    import time as _t

    try:
        import jax
        if jax.default_backend() == "cpu":
            return
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            _LAST_GOOD)
        hist = {}
        if os.path.exists(path):
            with open(path) as f:
                hist = json.load(f)
        hist[_lg_key(out["metric"], feed)] = dict(
            out, backend=jax.default_backend(),
            measured_at=_t.strftime("%Y-%m-%d %H:%M:%S"))
        with open(path, "w") as f:
            json.dump(hist, f, indent=1)
    except Exception:  # noqa: BLE001 — recording must never break a bench
        pass


def _attach_last_good(out: dict, feed: str) -> None:
    """On a dead device, attach the most recent LIVE measurement —
    clearly labeled, so a relay outage at capture time doesn't erase a
    real number (the value field stays 0: it was not measured now)."""
    import os

    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            _LAST_GOOD)
        if os.path.exists(path):
            with open(path) as f:
                hist = json.load(f)
            prev = hist.get(_lg_key(out["metric"], feed))
            if prev:
                out["last_good"] = prev
    except Exception:  # noqa: BLE001
        pass


def main(argv=None):
    import argparse
    import os
    import threading

    ap = argparse.ArgumentParser()
    ap.add_argument("--feed", choices=("staged", "reader", "prehashed",
                                       "score", "sharded"),
                    default="staged")
    ap.add_argument("--table_dtype", choices=("float32", "bfloat16"),
                    default="bfloat16",
                    help="embedding-table storage dtype. bfloat16 (default, "
                    "production setting: halves table HBM + gather traffic, "
                    "stochastic-rounding updates) measured 338.7K ex/s/chip "
                    "@65536 with eval AUC identical to float32 (0.61865 vs "
                    "0.61866, real chip 2026-08-18); float32 307.0K @49152.")
    ap.add_argument("--config", default="criteo_kaggle",
                    help="named config to bench (criteo_kaggle, avazu, ...); "
                    "the metric name carries the config so last-good records "
                    "stay per-config")
    ap.add_argument("--sparse_optimizer", default=None,
                    choices=(None, "adagrad", "adam", "rowwise_adam", "sgd"),
                    help="override the config's sparse optimizer (the "
                    "rowwise_adam silicon number rides the sharded feed); "
                    "non-default choices get their own last-good key")
    ap.add_argument("--batch", type=int, default=65536,
                    help="starting batch size (falls back down a ladder "
                    "through the known-good 49152/32768 rungs on OOM)")
    ap.add_argument("--timeout", type=int, default=900,
                    help="whole-run watchdog seconds. The TPU relay can die "
                    "mid-session, turning device ops into infinite hangs "
                    "inside PJRT C++ calls — not exceptions, and Python "
                    "signal handlers never fire while the GIL-holding call "
                    "blocks. A daemon thread prints the JSON line and "
                    "hard-exits instead; a benchmark that can hang forever "
                    "is not a benchmark.")
    args = ap.parse_args(argv)

    def _watchdog():
        out = {
            "metric": (f"{args.config}_score_examples_per_s_per_chip"
                   if args.feed == "score" else
                   f"{args.config}_train_step_examples_per_s_per_chip"),
            "value": 0.0,
            "unit": "examples/s",
            "vs_baseline": 0.0,
            "error": f"timeout after {args.timeout}s "
                     "(device/relay unresponsive)",
        }
        lg = (args.feed if args.table_dtype == "float32"
              else f"{args.feed}+{args.table_dtype}")
        if args.sparse_optimizer:
            lg = f"{lg}+{args.sparse_optimizer}"
        _attach_last_good(out, lg)
        print(json.dumps(out), flush=True)
        os._exit(0)

    if args.timeout > 0:
        timer = threading.Timer(args.timeout, _watchdog)
        timer.daemon = True
        timer.start()

    # Fallback ladder, not naive halving: after the first (largest)
    # candidate the next rungs are the measured-good 49152 (306.9K
    # ex/s/chip, f32, 2026-08-18) then 32768 — halving 65536 would
    # land on rungs that under-measure relative to the proven batches.
    # The streamed sparse apply is batch-independent, so larger batches
    # amortize it (docs/NEXT_EXPERIMENTS.md #1).
    ladder = sorted({args.batch, 65536, 49152, 32768, 16384, 8192, 4096},
                    reverse=True)
    ladder = [b for b in ladder if b <= args.batch] or [args.batch]
    value = 0.0
    error = None
    batch = ladder[0]
    for batch in ladder:
        try:
            value = _run_once(batch, feed=args.feed,
                              table_dtype=args.table_dtype,
                              config=args.config,
                              sparse_optimizer=args.sparse_optimizer)
            error = None
            break
        except Exception as e:  # noqa: BLE001 — resilience is the point
            error = f"{type(e).__name__} at batch={batch}"
            sys.stderr.write(f"bench: {error}: {e}\n")
            # Free the failed rung's device buffers before retrying:
            # clear_caches drops compiled programs, but the OOM'ed
            # arrays are only released once the traceback frames that
            # pin them are collected (observed: every bf16 rung down
            # to 4096 failing in one process while a fresh process ran
            # 4096 fine).
            try:
                import gc

                import jax
                e.__traceback__ = None
                jax.clear_caches()
                gc.collect()
            except Exception:  # noqa: BLE001
                pass

    out = {
        "metric": (f"{args.config}_score_examples_per_s_per_chip"
                   if args.feed == "score" else
                   f"{args.config}_train_step_examples_per_s_per_chip"),
        "value": round(value, 1),
        "unit": "examples/s",
        "vs_baseline": round(value / 125000.0, 3),
        "batch": batch,
    }
    if args.feed != "staged":
        out["feed"] = args.feed
    if args.table_dtype != "float32":
        out["table_dtype"] = args.table_dtype
    if args.sparse_optimizer:
        out["sparse_optimizer"] = args.sparse_optimizer
    if args.feed == "sharded":
        # T=1 caveat (VERDICT r3 weak #6): this runs the full routed
        # program on ONE chip — routing/dedup/update compute is real,
        # but the four all-to-alls are self-copies with ZERO
        # interconnect cost. It is the per-chip COMPUTE number of the
        # scaled config, NOT a projected 8-chip per-chip rate; see
        # docs/SCALING_MODEL.md for the exchange-time model.
        out["caveat"] = ("T=1: exchange collectives are free self-copies; "
                         "see docs/SCALING_MODEL.md")
    # bf16-table runs get their own last-good key (a variant must not
    # overwrite the flagship staged f32 number).
    lg_feed = (args.feed if args.table_dtype == "float32"
               else f"{args.feed}+{args.table_dtype}")
    if args.sparse_optimizer:
        lg_feed = f"{lg_feed}+{args.sparse_optimizer}"
    if error:
        out["error"] = error
        _attach_last_good(out, lg_feed)
    else:
        _record_last_good(out, lg_feed)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
