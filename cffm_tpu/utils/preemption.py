"""Preemption-safe shutdown (SURVEY.md §6, failure-detection row).

Production TPU jobs get preempted (maintenance events, spot
reclamation) with a SIGTERM and a grace window. Without handling,
progress since the last periodic checkpoint is lost and a mid-step
kill can leave a partial orbax write. This guard turns the signal
into a cooperative stop: the train loop checks it at step boundaries,
saves a final checkpoint, and exits cleanly; resume picks up at the
saved step through the normal restore path (train.run).

Multi-host: each process receives its own signal, possibly at
different times (or only a subset gets one). A host that stops early
while peers keep issuing collectives deadlocks the job, so the flag
is agreed on with a process_allgather at the caller's check cadence —
every host stops at the SAME step or none does. The allgather is a
host-level sync (~µs at log_every cadence); single-process runs skip
it entirely.
"""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Installs SIGTERM (and optionally SIGINT) handlers that set a
    flag instead of killing the process. Use `sync()` at step
    boundaries; it returns True on every host once ANY host saw the
    signal. Restores the previous handlers on close()."""

    def __init__(self, signals=(signal.SIGTERM,), install: bool = True):
        self._flag = threading.Event()
        self._prev = {}
        self._installed = False
        if install:
            try:
                for s in signals:
                    self._prev[s] = signal.signal(s, self._on_signal)
                self._installed = True
            except ValueError:
                # not the main thread (e.g. some test runners) — stay
                # a no-op guard rather than crash
                self._prev = {}

    def _on_signal(self, signum, frame):  # noqa: ARG002
        self._flag.set()

    @property
    def requested(self) -> bool:
        return self._flag.is_set()

    def request(self) -> None:
        """Programmatic trigger (tests, embedding frameworks)."""
        self._flag.set()

    def sync(self) -> bool:
        """Cross-host agreement: True iff any process has the flag.
        Call at the same program point on every host (it is a
        collective when process_count > 1)."""
        import jax

        if jax.process_count() <= 1:
            return self.requested
        import numpy as np
        from jax.experimental import multihost_utils

        return bool(multihost_utils.process_allgather(
            np.asarray(self.requested)).any())

    def close(self) -> None:
        if self._installed:
            for s, prev in self._prev.items():
                try:
                    signal.signal(s, prev)
                except ValueError:
                    pass
            self._installed = False
