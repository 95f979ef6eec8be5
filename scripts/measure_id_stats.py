"""Measure distinct-id / overflow statistics on the bench stream.

VERDICT r4 missing #3: docs/SCALING_MODEL.md §2/§4 assumed a x0.3
skew factor for distinct ids and kept `id_capacity_factor` at the
worst-case 2.0, padding the T=8 exchange ~3x over the information
floor. The bench stream is already Zipf(1.3) (data/synthetic.py:56),
so per-shard distinct-id counts ARE measurable on this rig — this
script measures them (pure numpy, no TPU needed) and prints the table
SCALING_MODEL cites.

Measured quantities, per steps x shards:
  - per-chip distinct ids (drives the flat dedup buffer + T=1 tail)
  - per (chip, owner) bucket occupancy vs capacity at factor f
    (drives the flat exchange payload + overflow risk)
  - HOST-distinct ids (the hierarchical stage-2 dedup) and per
    (gateway, owner-host) bucket occupancy -> the real DCN payload
  - ratios vs the static bounds (unique_bound and the even-split
    capacity base) -> the justified id_capacity_factor

Usage: python scripts/measure_id_stats.py [--config=criteo_full]
       [--batch=65536] [--steps=8] [--json=out.json]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

from cffm_tpu.config import get_config
from cffm_tpu.data.synthetic import SyntheticCTR
from cffm_tpu.models.cffm import field_offsets
from cffm_tpu.optim.rowwise import unique_bound


def measure(cfg, batch, steps, topologies):
    mcfg = cfg.model
    f = mcfg.num_fields
    offs = field_offsets(mcfg)[None, :].astype(np.int64)
    gen = SyntheticCTR(mcfg, batch, seed=cfg.data.seed)
    out = {"config": cfg.name, "batch": batch, "steps": steps,
           "topologies": {}}

    batches = []
    for _ in range(steps):
        ids, _, _ = gen.next_batch()
        batches.append(np.asarray(ids, np.int64) + offs)  # (B, F) global

    for (h, c) in topologies:
        t = h * c
        if batch % t:
            continue
        b_loc = batch // t
        n_local = b_loc * f
        ub_chip = unique_bound(mcfg.vocab_sizes, b_loc)
        ub_host = unique_bound(mcfg.vocab_sizes, b_loc * c)
        base_flat = -(-n_local // t)      # even-split capacity base
        base_h2 = None

        chip_uniq, bucket_max, bucket_mean = [], [], []
        host_uniq, hbucket_max, s1bucket_max = [], [], []
        for g in batches:
            # flat shards: chip s takes batch rows [s*b_loc, (s+1)*b_loc)
            per_chip = g.reshape(t, b_loc * f)
            for s in range(t):
                ids_s = per_chip[s]
                u = np.unique(ids_s)
                chip_uniq.append(len(u))
                # owner buckets under mod-sharding
                owners = u % t
                counts = np.bincount(owners, minlength=t)
                bucket_max.append(int(counts.max()))
                bucket_mean.append(float(counts.mean()))
            if h > 1:
                # hierarchical stage 1: per chip, distinct ids grouped
                # by owner chip INDEX (the gateway) — sizes cap_rows
                for s in range(t):
                    u = np.unique(per_chip[s])
                    gw = (u % t) % c
                    counts = np.bincount(gw, minlength=c)
                    s1bucket_max.append(int(counts.max()))
                # hierarchical stage 2: per host, per gateway (owner
                # chip index), distinct ids bucketed by owner host
                per_host = g.reshape(h, b_loc * c * f)
                for hh in range(h):
                    uh = np.unique(per_host[hh])
                    host_uniq.append(len(uh))
                    oc = (uh % t) % c          # gateway index
                    for cc in range(c):
                        sel = uh[oc == cc]
                        # counts per owner host for this gateway
                        counts = np.bincount(((sel % t) // c),
                                             minlength=h)
                        hbucket_max.append(int(counts.max()))

        rec = {
            "b_loc": b_loc, "n_local": n_local,
            "unique_bound_chip": ub_chip,
            "chip_distinct_mean": float(np.mean(chip_uniq)),
            "chip_distinct_max": int(np.max(chip_uniq)),
            "distinct_over_bound": float(np.mean(chip_uniq)
                                         / min(ub_chip, n_local)),
            "flat_bucket_base": base_flat,
            "flat_bucket_max": int(np.max(bucket_max)),
            "flat_bucket_mean": float(np.mean(bucket_mean)),
            # the factor that would have covered the worst bucket seen
            "flat_factor_needed": float(np.max(bucket_max) / base_flat),
        }
        if h > 1:
            rec.update({
                "unique_bound_host": ub_host,
                "host_distinct_mean": float(np.mean(host_uniq)),
                "host_distinct_max": int(np.max(host_uniq)),
                "host_distinct_over_bound": float(
                    np.mean(host_uniq) / min(ub_host, b_loc * c * f)),
                "hier_s1_bucket_max": int(np.max(s1bucket_max)),
                "hier_s2_bucket_max": int(np.max(hbucket_max)),
                # DCN rows/host/step with host dedup = host_distinct *
                # (h-1)/h remote fraction
                "dcn_rows_per_host_step": float(
                    np.mean(host_uniq) * (h - 1) / h),
            })
        out["topologies"][f"{h}x{c}"] = rec

    # ---- hot-row replication analysis (VERDICT r4 missing #2) ----
    # Of the HOST-distinct rows per step (what actually crosses DCN
    # after host-level dedup), what fraction sits in the global top-K
    # hottest rows? That fraction is the DCN traffic replication of the
    # top-K head could remove — against a psum cost of K*W bytes/step.
    # Uses the first measured multi-host topology from `topologies`.
    multi = [(h, c) for (h, c) in topologies if h > 1 and batch % (h * c) == 0]
    out["head_overlap"] = {}
    if multi:
        h, c = multi[0]
        allids = np.concatenate([g.reshape(-1) for g in batches])
        freq_ids, freq = np.unique(allids, return_counts=True)
        ranked = freq_ids[np.argsort(-freq)]
        b_loc = batch // (h * c)
        host_u = np.unique(batches[0].reshape(h, b_loc * c * f)[0])
        pos = np.full(int(freq_ids.max()) + 1, -1, np.int64)
        pos[ranked] = np.arange(len(ranked))
        ranks = pos[host_u]
        out["head_overlap_topology"] = f"{h}x{c}"
        for k in (1 << 14, 1 << 16, 1 << 18):
            frac = float(np.mean((ranks >= 0) & (ranks < k)))
            out["head_overlap"][str(k)] = frac
    else:
        print("head-overlap analysis skipped: no multi-host topology "
              "divides the batch", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="criteo_full")
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    cfg = get_config(args.config)
    topologies = [(1, 1), (1, 8), (2, 8), (2, 4)]
    out = measure(cfg, args.batch, args.steps, topologies)

    w = cfg.model.table_width
    s = 2 if cfg.model.table_dtype == "bfloat16" else 4
    print(f"# id stats: {cfg.name} batch={args.batch} steps={args.steps} "
          f"W={w} dtype={cfg.model.table_dtype}")
    for topo, r in out["topologies"].items():
        print(f"\n== {topo} (b_loc={r['b_loc']}, n_local={r['n_local']}) ==")
        print(f"  chip distinct: mean {r['chip_distinct_mean']:.0f} / "
              f"max {r['chip_distinct_max']} "
              f"(bound {r['unique_bound_chip']}, ratio "
              f"{r['distinct_over_bound']:.3f})")
        print(f"  flat owner-bucket: base {r['flat_bucket_base']} "
              f"max-seen {r['flat_bucket_max']} "
              f"mean {r['flat_bucket_mean']:.0f} -> factor needed "
              f"{r['flat_factor_needed']:.3f}")
        if "host_distinct_mean" in r:
            print(f"  host distinct: mean {r['host_distinct_mean']:.0f} / "
                  f"max {r['host_distinct_max']} "
                  f"(bound {r['unique_bound_host']}, ratio "
                  f"{r['host_distinct_over_bound']:.3f})")
            print(f"  hier stage-1 (chip,gateway) bucket max: "
                  f"{r['hier_s1_bucket_max']}")
            print(f"  hier stage-2 gateway->owner-host bucket max: "
                  f"{r['hier_s2_bucket_max']}")
            gb = r["dcn_rows_per_host_step"] * w * s / 1e9
            print(f"  DCN rows/host/step (host-dedup): "
                  f"{r['dcn_rows_per_host_step']:.0f} "
                  f"= {gb:.3f} GB/host/step one-way")
    if out.get("head_overlap"):
        print(f"\n== hot-row replication: fraction of "
              f"{out['head_overlap_topology']} HOST-distinct rows inside "
              f"the global top-K head ==")
        for k, frac in out["head_overlap"].items():
            print(f"  K={int(k):>7}: {frac:.3f}")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
