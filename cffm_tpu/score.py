"""Batch scoring (inference) path: checkpoint -> CTR probabilities.

The "scoring engine" half of the north star (BASELINE.json: "CTR
training/scoring engine"). Loads a checkpoint, streams a dataset, and
writes one probability per example (optionally with AUC/logloss when
labels exist).

Usage: python -m cffm_tpu.score --config=<name> --checkpoint_dir=... \
           [--output=preds.txt] [--data.path=...]
"""

from __future__ import annotations

import json
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu import metrics
from cffm_tpu.config import TrainConfig


def score(cfg: TrainConfig, num_batches: int = 0, output: Optional[str] = None,
          log_fn=print) -> dict:
    """Returns {"auc", "logloss", "count"} over the scored stream."""
    from cffm_tpu.checkpoint import CheckpointManager
    from cffm_tpu.data.loader import make_dataset
    from cffm_tpu.train import create_state, default_interaction_fn, eval_step

    if not cfg.checkpoint_dir:
        raise SystemExit("error: --checkpoint_dir is required for scoring")
    state = create_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(cfg.checkpoint_dir)
    # replicated scoring state = 1 table shard; restore_auto reshards
    # checkpoints saved under a different topology (mod-sharded layout)
    state, meta = mgr.restore_auto(state, cfg, num_shards=1)
    mgr.close()
    log_fn(json.dumps({"restored": meta, "step": int(state.step)}))

    interaction_fn = default_interaction_fn(cfg)
    ds = make_dataset(cfg, jax.process_index(), jax.process_count(),
                      split="val")

    from cffm_tpu.models.cffm import forward

    # +ln(neg_downsample): undo train-time negative-downsampling odds
    # inflation (0 when not configured)
    cal = metrics.calibration_offset(cfg.data)

    @jax.jit
    def predict(params, ids, dense):
        return jax.nn.sigmoid(
            forward(params, ids, dense, cfg.model,
                    interaction_fn=interaction_fn) + cal)

    out_fh = open(output, "w") if output else None
    auc_state = metrics.auc_state_init()
    n = num_batches or cfg.data.eval_batches
    for _ in range(n):
        batch = next(ds)
        ids = jnp.asarray(batch["ids"])
        dense = None if batch["dense"] is None else jnp.asarray(batch["dense"])
        probs = predict(state.params, ids, dense)
        logits = jnp.log(probs) - jnp.log1p(-probs)
        auc_state = metrics.auc_state_update(
            auc_state, logits, jnp.asarray(batch["labels"]))
        if out_fh:
            np.savetxt(out_fh, np.asarray(probs), fmt="%.6f")
    if out_fh:
        out_fh.close()
    result = {k: float(v) for k, v in metrics.auc_state_finalize(auc_state).items()}
    log_fn(json.dumps({"score": result}))
    return result


def main(argv=None):
    from cffm_tpu.cli import _apply_override
    from cffm_tpu.config import get_config, list_configs
    import argparse

    parser = argparse.ArgumentParser(prog="cffm_tpu.score")
    parser.add_argument("--config", required=True, help=f"one of {list_configs()}")
    parser.add_argument("--output", default=None, help="write probabilities here")
    parser.add_argument("--num_batches", type=int, default=0)
    parser.add_argument("--platform", default=None)
    args, rest = parser.parse_known_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = get_config(args.config)
    for item in rest:
        if not item.startswith("--") or "=" not in item:
            raise SystemExit(f"error: unrecognized argument {item!r}")
        dotted, raw = item[2:].split("=", 1)
        cfg = _apply_override(cfg, dotted, raw)
    score(cfg, num_batches=args.num_batches, output=args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
