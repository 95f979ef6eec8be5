"""Optional TensorBoard scalar logging (SURVEY.md §6, metrics row).

Stdout JSONL is the primary metrics channel; this mirrors the same
scalars into TF event files when ``TrainConfig.tensorboard_dir`` is set.
TensorFlow is only imported on first use, and any import/write failure
degrades to a no-op (the training loop must never die on a logger).
"""

from __future__ import annotations

from typing import Optional


class ScalarWriter:
    """tf.summary scalar writer; silently no-ops if tf is unavailable."""

    def __init__(self, logdir: Optional[str]):
        self._writer = None
        if not logdir:
            return
        try:
            import tensorflow as tf  # noqa: PLC0415 — heavyweight, lazy

            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:  # noqa: BLE001 — logger must never kill training
            self._writer = None

    def scalars(self, step: int, values: dict) -> None:
        if self._writer is None:
            return
        try:
            with self._writer.as_default(step=step):
                for k, v in values.items():
                    if isinstance(v, (int, float)):
                        self._tf.summary.scalar(k, v)
            self._writer.flush()
        except Exception:  # noqa: BLE001
            self._writer = None

    def close(self) -> None:
        if self._writer is not None:
            try:
                self._writer.close()
            except Exception:  # noqa: BLE001
                pass
            self._writer = None
