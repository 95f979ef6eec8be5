"""Checkpoint/resume via orbax (SURVEY.md §6): async-capable, sharded-aware
save of params + per-row optimizer state, with step/config metadata.

The mod-sharded table storage layout (parallel/sharded_embedding.py)
depends on the shard count T, so checkpoints record T; restoring onto a
different T requires `reshard_tables` (natural-layout round trip).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from cffm_tpu.config import TrainConfig
from cffm_tpu.train import TrainState


def _meta(cfg: TrainConfig, num_shards: int) -> dict:
    return {
        "config_name": cfg.name,
        "num_table_shards": num_shards,
        "total_vocab": cfg.model.total_vocab,
        "table_width": cfg.model.table_width,
    }


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, cfg: TrainConfig,
             num_shards: int = 1, wait: bool = False):
        payload = {
            "state": {
                "step": state.step,
                "params": state.params,
                "dense_opt_state": state.dense_opt_state,
                "sparse_opt_state": state.sparse_opt_state,
            },
            "meta": _meta(cfg, num_shards),
        }
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload["state"]),
                meta=ocp.args.JsonSave(payload["meta"]),
            ),
        )
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None
                ) -> tuple[TrainState, dict]:
        """Restore into the structure/shardings of `state_like`."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {
            "step": state_like.step,
            "params": state_like.params,
            "dense_opt_state": state_like.dense_opt_state,
            "sparse_opt_state": state_like.sparse_opt_state,
        }
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        s = out["state"]
        meta = out["meta"]
        return TrainState(s["step"], s["params"], s["dense_opt_state"],
                          s["sparse_opt_state"]), meta

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def reshard_tables(state: TrainState, cfg: TrainConfig,
                   from_shards: int, to_shards: int) -> TrainState:
    """Re-permute mod-sharded table storage for a different shard count."""
    from cffm_tpu.parallel.sharded_embedding import (from_mod_sharded,
                                                     to_mod_sharded)

    if from_shards == to_shards:
        return state
    v = cfg.model.total_vocab

    def remap(x):
        nat = from_mod_sharded(x, from_shards, v) if from_shards > 1 else x[:v]
        return to_mod_sharded(nat, to_shards) if to_shards > 1 else nat

    params = dict(state.params)
    params["embed"] = {"table": remap(params["embed"]["table"])}
    if "linear" in params and "table" in params["linear"]:
        params["linear"] = dict(params["linear"],
                                table=remap(params["linear"]["table"]))
    # Remap EVERY table-shaped leaf of the sparse state (adagrad accum,
    # Adam m/v, any future per-row state) — scalars like Adam's t pass
    # through. A leaf is table-shaped iff it is 2-D with one row per
    # (padded) vocab row.
    from_pad = _round_up(v, from_shards)

    def remap_leaf(x):
        if getattr(x, "ndim", 0) == 2 and x.shape[0] == from_pad:
            return remap(x)
        return x

    sparse = jax.tree.map(remap_leaf, state.sparse_opt_state)
    return TrainState(state.step, params, state.dense_opt_state, sparse)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
