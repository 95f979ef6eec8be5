"""Tracing/profiling + structured logging (SURVEY.md §6).

- `trace(dir)` context manager wraps jax.profiler.trace -> Perfetto/
  TensorBoard-viewable traces.
- `StepTimer` measures per-step wall time with periodic device drains
  (the axon relay's block_until_ready is dispatch-ack only, so we drain
  through a scalar readback at sync points; see docs/PLATFORM_NOTES.md).
- `JsonlLogger` appends one JSON object per line (metrics/events).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step timing with periodic hard syncs.

    Call .step(sync_value) each iteration; pass any small device array
    (e.g. the loss) — every `sync_every` steps it is read back to pin
    the async dispatch queue to real time.
    """

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._count = 0
        self._t0 = time.time()
        self._synced_examples = 0
        self.examples_per_s = float("nan")

    def step(self, sync_value, batch_size: int):
        self._count += 1
        self._synced_examples += batch_size
        if self._count % self.sync_every == 0:
            float(jnp.sum(sync_value))  # D2H drain: queue is now empty
            now = time.time()
            self.examples_per_s = self._synced_examples / (now - self._t0)
            self._t0 = now
            self._synced_examples = 0
        return self.examples_per_s


class JsonlLogger:
    """Structured per-step metrics -> stdout and/or a JSONL file."""

    def __init__(self, path: Optional[str] = None, also_stdout: bool = True):
        self._fh = open(path, "a") if path else None
        self._stdout = also_stdout

    def log(self, record: dict):
        line = json.dumps(record)
        if self._stdout:
            print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()


def device_memory_stats() -> dict:
    """Best-effort HBM usage for the default device."""
    try:
        stats = jax.devices()[0].memory_stats()
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    except Exception:
        return {}
