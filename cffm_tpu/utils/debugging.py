"""Collective-order debug probes (SURVEY.md §6, race-detection row).

XLA programs are SPMD-deterministic, so the failure mode that replaces
data races here is a collective-order mismatch: one host traces a
different program (or consumes a different stream) and every device
blocks inside an all-to-all forever — silently. With
``TrainConfig.debug_barriers=True`` the sharded step emits an ordered
host-callback heartbeat before and after each collective region; when a
run hangs, the last tag printed on each host names the collective it is
stuck in and which side reached it.

Zero cost when disabled: the probe is a Python no-op at trace time, so
the compiled program is unchanged.
"""

from __future__ import annotations

import jax


def collective_probe(tag: str, index, enabled: bool) -> None:
    """Emit `[collective] <tag> shard=<i>` from inside shard_map.

    index: the device's GLOBAL shard index (a traced scalar, e.g.
    router.shard_index()) or an axis name. On multi-axis meshes pass
    the flattened index — printing only one axis would make a hang in
    the other axis's collective indistinguishable across devices."""
    if not enabled:
        return
    if isinstance(index, str):
        index = jax.lax.axis_index(index)
    jax.debug.print("[collective] " + tag + " shard={i}",
                    i=index, ordered=False)
