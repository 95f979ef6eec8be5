"""CLI entry point: `python -m cffm_tpu.train --config=<name> [overrides]`.

Config/flags layer (SURVEY.md L7). Overrides use dotted paths into the
frozen dataclass tree, e.g. --data.num_train_steps=100.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def _apply_override(cfg, dotted: str, raw: str):
    parts = dotted.split(".")
    def rec(obj, path):
        field = path[0]
        if not hasattr(obj, field):
            raise SystemExit(f"error: unknown config field {dotted!r}")
        if len(path) == 1:
            cur = getattr(obj, field)
            if isinstance(cur, bool):
                val = raw.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                val = int(raw)
            elif isinstance(cur, float):
                val = float(raw)
            elif isinstance(cur, tuple):
                val = tuple(int(x) for x in raw.split(","))
            elif cur is None or isinstance(cur, str):
                val = raw
            else:
                raise SystemExit(f"error: cannot override field {dotted!r} of type {type(cur)}")
            return dataclasses.replace(obj, **{field: val})
        return dataclasses.replace(obj, **{field: rec(getattr(obj, field), path[1:])})
    return rec(cfg, parts)


def main(argv=None):
    from cffm_tpu.config import get_config, list_configs

    parser = argparse.ArgumentParser(
        prog="cffm_tpu.train",
        description="TPU-native CFFM CTR training",
    )
    parser.add_argument("--config", required=True, help=f"one of {list_configs()}")
    parser.add_argument("--platform", default=None,
                        help="jax platform override (e.g. cpu for local runs)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: call jax.distributed.initialize() "
                             "(reads JAX coordinator env vars / TPU metadata)")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a device trace into this directory")
    args, rest = parser.parse_known_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # SPMD process boundary (SURVEY.md §4.3): all hosts join before
        # any jit call so compilation order matches across processes.
        jax.distributed.initialize()

    try:
        cfg = get_config(args.config)
    except KeyError as e:
        raise SystemExit(f"error: {e.args[0]}")

    for item in rest:
        if not item.startswith("--") or "=" not in item:
            raise SystemExit(f"error: unrecognized argument {item!r} (want --path.to.field=value)")
        dotted, raw = item[2:].split("=", 1)
        cfg = _apply_override(cfg, dotted, raw)

    from cffm_tpu import train

    if args.profile_dir:
        from cffm_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            result = train.run(cfg)
    else:
        result = train.run(cfg)
    return 0 if result.get("auc") == result.get("auc") else 1  # NaN check


if __name__ == "__main__":
    sys.exit(main())
