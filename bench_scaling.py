"""Scaling sweep: train-step throughput at 1 chip and all visible chips
(BASELINE.md measurement points: 1 chip / 1 host / >=2 hosts).

Prints one JSON line per configuration plus a scaling-efficiency line
when more than one device is visible. On the current 1-chip dev rig it
reports the single-chip point; on a v5e-8 it exercises the row-sharded
all-to-all engine across all 8 chips.
"""

import dataclasses
import json
import sys
import time


def _measure(step_fn, state, args, batch, rtt, n=10):
    import jax
    import jax.numpy as jnp

    state, m = step_fn(state, *args)
    _ = float(jnp.sum(jax.tree.leaves(m)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        state, m = step_fn(state, *args)
    _ = float(jnp.sum(jax.tree.leaves(m)[0].astype(jnp.float32)))
    dt = max(time.time() - t0 - rtt, 1e-9) / n
    return batch / dt


def main():
    import argparse
    import os
    import threading

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for the 8-dev mesh)")
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--hier", default=None, metavar="HxC",
                    help="also run the HIERARCHICAL host-level-dedup "
                    "exchange on an HxC (host, chip) mesh split of the "
                    "visible devices (e.g. 2x4) — the A/B leg "
                    "SCALING_MODEL.md §6 asks for. NOTE: this script "
                    "feeds process-local arrays, so it is single-"
                    "process only (one controller, all devices "
                    "addressable); on a real multi-host job drive "
                    "train.py instead (it assembles global batches via "
                    "make_array_from_process_local_data)")
    ap.add_argument("--timeout", type=int, default=900,
                    help="whole-run watchdog seconds (the relay can hang "
                    "device ops forever; same rationale as bench.py)")
    args = ap.parse_args()

    def _watchdog():
        print(json.dumps({"metric": "examples_per_s", "devices": 0,
                          "value": 0.0,
                          "error": f"timeout after {args.timeout}s "
                                   "(device/relay unresponsive)"}),
              flush=True)
        os._exit(0)

    if args.timeout > 0:
        t = threading.Timer(args.timeout, _watchdog)
        t.daemon = True
        t.start()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.config import get_config
    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.train import create_state, default_interaction_fn, train_step
    from cffm_tpu.utils.timing import measure_rtt

    ndev = jax.device_count()
    cfg = get_config("criteo_kaggle")
    batch = args.batch
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=batch))

    rng = np.random.default_rng(0)
    ids_local = np.stack(
        [rng.integers(0, v, size=batch) for v in cfg.model.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    dense = jnp.asarray(rng.normal(size=(batch, 13)), jnp.float32)
    labels = jnp.asarray((rng.random(batch) < 0.3).astype(np.float32))
    interaction_fn = default_interaction_fn(cfg)
    rtt = measure_rtt()

    # --- 1 chip (replicated tables) ---
    state = create_state(cfg, jax.random.key(0))

    def single_step(state, ids, dense, labels):
        return train_step(state, ids, dense, labels, cfg, interaction_fn)

    single = _measure(single_step, state, (ids, dense, labels), batch, rtt)
    print(json.dumps({"metric": "examples_per_s", "devices": 1,
                      "value": round(single, 1)}))
    del state

    if ndev > 1:
        # --- all chips (row-sharded tables + DP dense) ---
        from cffm_tpu.parallel.mesh import make_mesh
        from cffm_tpu.parallel.sharded_train import (
            create_sharded_state, make_sharded_train_step)

        scfg = dataclasses.replace(
            cfg, sharding=dataclasses.replace(cfg.sharding, table_sharded=True))
        mesh = make_mesh()
        sstate = create_sharded_state(scfg, jax.random.key(0), mesh)
        sstep = make_sharded_train_step(scfg, mesh, interaction_fn)
        multi = _measure(sstep, sstate, (ids, dense, labels), batch, rtt)
        eff = multi / (single * ndev)
        print(json.dumps({"metric": "examples_per_s", "devices": ndev,
                          "value": round(multi, 1),
                          "scaling_efficiency": round(eff, 3)}))
        del sstate

        # --- hierarchical host-level-dedup exchange (A/B vs flat) ---
        hier = args.hier
        if hier:
            from jax.sharding import PartitionSpec as P

            from cffm_tpu.parallel.dcn_mesh import make_mesh_2d
            from cffm_tpu.parallel.sharded_train import (
                make_sharded_train_step_hier)

            h, c = (int(x) for x in hier.lower().split("x"))
            hcfg = dataclasses.replace(
                scfg, sharding=dataclasses.replace(
                    scfg.sharding, table_axis="hier"))
            mesh2 = make_mesh_2d(h, c)
            hstate = create_sharded_state(
                hcfg, jax.random.key(0), mesh2,
                table_pspec=P(("host", "chip"), None))
            hstep = make_sharded_train_step_hier(hcfg, mesh2,
                                                 interaction_fn)
            hval = _measure(hstep, hstate, (ids, dense, labels), batch,
                            rtt)
            print(json.dumps({"metric": "examples_per_s",
                              "devices": h * c, "exchange": "hier",
                              "mesh": f"{h}x{c}",
                              "value": round(hval, 1),
                              "scaling_efficiency": round(
                                  hval / (single * h * c), 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
