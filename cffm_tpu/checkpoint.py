"""Checkpoint/resume via orbax (SURVEY.md §6): async-capable, sharded-aware
save of params + per-row optimizer state, with step/config metadata.

The mod-sharded table storage layout (parallel/sharded_embedding.py)
depends on the shard count T, so checkpoints record T; restoring onto a
different T requires `reshard_tables` (natural-layout round trip).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
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

    def restore_meta(self, step: Optional[int] = None) -> dict:
        """Read only the JSON metadata of a checkpoint (cheap)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        out = self._mgr.restore(
            step, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))
        return out["meta"]

    def restore_auto(self, state_like: TrainState, cfg: TrainConfig,
                     num_shards: int, step: Optional[int] = None
                     ) -> tuple[TrainState, dict]:
        """Restore, resharding table storage if the checkpoint was saved
        under a different table-shard count (mod-sharded layout depends
        on T — blind restore would silently load a wrong row
        permutation whenever the padded shapes coincide).
        """
        meta = self.restore_meta(step)
        from_shards = int(meta.get("num_table_shards", 1))
        if meta.get("total_vocab") not in (None, cfg.model.total_vocab):
            raise ValueError(
                f"checkpoint total_vocab={meta['total_vocab']} != config "
                f"total_vocab={cfg.model.total_vocab} — wrong config?")
        if from_shards == num_shards:
            return self.restore(state_like, step)

        # Restore into the SAVED topology's shapes (host/default
        # placement), re-permute, then place onto state_like's shardings.
        v = cfg.model.total_vocab
        from_pad = _round_up(v, from_shards)
        to_pad = state_like.params["embed"]["table"].shape[0]

        def as_saved_shape(x):
            shape = tuple(np.shape(x))
            if len(shape) == 2 and shape[0] == to_pad:
                shape = (from_pad,) + shape[1:]
            return jax.ShapeDtypeStruct(shape, x.dtype)

        template = {
            "step": as_saved_shape(state_like.step),
            "params": jax.tree.map(as_saved_shape, state_like.params),
            "dense_opt_state": jax.tree.map(as_saved_shape,
                                            state_like.dense_opt_state),
            "sparse_opt_state": jax.tree.map(as_saved_shape,
                                             state_like.sparse_opt_state),
        }
        step = step if step is not None else self._mgr.latest_step()
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(template),
                                    meta=ocp.args.JsonRestore()),
        )
        s = out["state"]
        restored = TrainState(s["step"], s["params"], s["dense_opt_state"],
                              s["sparse_opt_state"])
        resharded = reshard_tables(restored, cfg, from_shards, num_shards)

        def place(x, ref):
            # match state_like's placement; leave uncommitted leaves
            # (e.g. the step scalar) uncommitted so jit stays free to
            # co-locate them with the mesh
            sh = getattr(ref, "sharding", None)
            if sh is not None and getattr(ref, "committed", False):
                return jax.device_put(x, sh)
            # numpy round-trip: orbax returns COMMITTED arrays, and
            # jnp.asarray on one is a no-op — this is the only way to
            # get back an uncommitted array
            return jnp.asarray(np.asarray(x))

        placed = jax.tree.map(place, tuple(resharded), tuple(state_like))
        return TrainState(*placed), out["meta"]

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
