"""Serving export: freeze the scoring function to a StableHLO artifact.

The deployable half of the "training/scoring engine" north star: a
self-describing artifact a serving process can load WITHOUT the model
code — `jax.export` serializes the lowered scoring computation
(params, ids[, dense]) -> probabilities with a SYMBOLIC batch
dimension, lowered for both "tpu" and "cpu", so one artifact serves
any batch size on either platform. Params stay call arguments (loaded
from the orbax checkpoint at serving init), keeping the artifact small
and the weights hot-swappable.

The exported graph uses the pure-XLA interaction path (not the Pallas
training kernel): scoring is forward-only and gather/matmul-bound, XLA
fuses the reference path to the same ops, and a Mosaic-free artifact
stays loadable on any future runtime.

Usage:
  python -m cffm_tpu.export --config=<name> --checkpoint_dir=... \
      --out=/path/model.cffm [--platforms=tpu,cpu]
Serving:
  fn = load_scoring_fn("/path/model.cffm")
  probs = fn(params, ids, dense)   # any batch size
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
from jax import export as jexport

from cffm_tpu.config import TrainConfig
from cffm_tpu.metrics import calibration_offset as _cal_offset

_MAGIC = b"CFFM-EXPORT-v1\n"


def scoring_fn(cfg: TrainConfig):
    """(params, ids[, dense]) -> probabilities, pure-XLA path.

    Bakes in the negative-downsampling calibration offset
    (metrics.calibration_offset) — the artifact serves the TRUE
    distribution regardless of how the training stream was sampled."""
    from cffm_tpu.metrics import calibration_offset
    from cffm_tpu.models.cffm import forward

    mcfg = cfg.model
    cal = calibration_offset(cfg.data)
    if mcfg.num_dense > 0:
        def predict(params, ids, dense):
            return jax.nn.sigmoid(forward(params, ids, dense, mcfg) + cal)
    else:
        def predict(params, ids):
            return jax.nn.sigmoid(forward(params, ids, None, mcfg) + cal)
    return predict


def export_scoring(cfg: TrainConfig, params, platforms=("tpu", "cpu")) -> bytes:
    """Serialize the scoring computation with a symbolic batch dim."""
    mcfg = cfg.model
    (b,) = jexport.symbolic_shape("b")
    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        params)
    ids_spec = jax.ShapeDtypeStruct((b, mcfg.num_fields), jnp.int32)
    args = (p_spec, ids_spec)
    if mcfg.num_dense > 0:
        args += (jax.ShapeDtypeStruct((b, mcfg.num_dense), jnp.float32),)
    exp = jexport.export(jax.jit(scoring_fn(cfg)),
                         platforms=tuple(platforms))(*args)
    return exp.serialize()


def save_artifact(path: str, blob: bytes, cfg: TrainConfig,
                  step: int | None = None) -> None:
    """MAGIC + meta-JSON line + serialized export, one file."""
    meta = {
        "config": cfg.name,
        "num_fields": cfg.model.num_fields,
        "num_dense": cfg.model.num_dense,
        "table_dtype": cfg.model.table_dtype,
        "calibration_offset": _cal_offset(cfg.data),
        "step": step,
        "jax": jax.__version__,
    }
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write((json.dumps(meta) + "\n").encode())
        f.write(blob)


def load_artifact(path: str):
    """Returns (meta dict, jax.export.Exported)."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(_MAGIC):
        raise ValueError(f"{path}: not a CFFM export artifact")
    rest = data[len(_MAGIC):]
    nl = rest.index(b"\n")
    meta = json.loads(rest[:nl].decode())
    return meta, jexport.deserialize(rest[nl + 1:])


def load_scoring_fn(path: str):
    """Callable (params, ids[, dense]) -> probabilities."""
    _, exp = load_artifact(path)
    return exp.call


def main(argv=None):
    import argparse

    from cffm_tpu.cli import _apply_override
    from cffm_tpu.config import get_config, list_configs

    ap = argparse.ArgumentParser(prog="cffm_tpu.export")
    ap.add_argument("--config", required=True, help=f"one of {list_configs()}")
    ap.add_argument("--out", required=True, help="artifact output path")
    ap.add_argument("--platforms", default="tpu,cpu")
    ap.add_argument("--platform", default=None,
                    help="jax platform to run the export under")
    args, rest = ap.parse_known_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = get_config(args.config)
    for item in rest:
        if not item.startswith("--") or "=" not in item:
            raise SystemExit(f"error: unrecognized argument {item!r}")
        dotted, raw = item[2:].split("=", 1)
        cfg = _apply_override(cfg, dotted, raw)

    from cffm_tpu.train import create_state

    state = create_state(cfg, jax.random.key(0))
    step = None
    if cfg.checkpoint_dir:
        from cffm_tpu.checkpoint import CheckpointManager

        mgr = CheckpointManager(cfg.checkpoint_dir)
        state, meta = mgr.restore_auto(state, cfg, num_shards=1)
        mgr.close()
        step = int(state.step)

    blob = export_scoring(cfg, state.params,
                          platforms=tuple(args.platforms.split(",")))
    save_artifact(args.out, blob, cfg, step=step)
    print(json.dumps({"exported": args.out, "bytes": len(blob),
                      "platforms": args.platforms, "step": step}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
