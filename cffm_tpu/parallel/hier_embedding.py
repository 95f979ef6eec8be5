"""Hierarchical (host-level dedup) embedding exchange.

Closes the one BASELINE.md row the flat exchange cannot meet
(docs/SCALING_MODEL.md §4, VERDICT r4 missing #1): on a 2-host mesh the
flat all-to-all ships every chip's deduped requests straight to the
owner chip, so a row wanted by all 8 chips of a host crosses DCN 8
times — 6.55 GB/host/step at the criteo_full operating point vs 25.7 ms
of compute (~9-14% scaling efficiency). The hierarchical exchange ships
each HOST-distinct row once per host (the information floor):

  stage 1 (ICI, "chip" axis): each chip sorts its local ids by
      (owner_chip_index, owner_host, local_row) and all-to-alls the
      per-owner-chip-index buckets WITHIN the host. Gateway chip c of
      host h now holds every id the host wants from ANY host's chip c.
  stage 2 (DCN, "host" axis): the gateway dedups that union across the
      host's chips (the host-level dedup) and all-to-alls the
      host-distinct ids to the owner hosts — between same-chip-index
      peers only, so all C NIC paths carry traffic in parallel. The
      owner chip serves rows from its local shard; rows ride the
      reverse path (host a2a, then chip a2a) back to original
      positions.

  gradients run the same two stages in reverse, with a dedup-SUM at
  each hop: per-chip partial sums over ICI, host-level pre-sums over
  DCN — each host-distinct row's gradient crosses DCN exactly once.

Both stages reuse `sharded_embedding.build_routing`'s single-sort slice
routing via its `keys=` parameter: stage 1's sort key is
c_o·(H·Vs) + (h_o·Vs + local) so each intra-host bucket arrives at the
gateway already ascending in the stage-2 storage key, and stage 2 runs
directly on the received values (sentinel H·Vs sorts past the last
owner host and is dropped by the bucket boundaries).

Table layout is IDENTICAL to the flat path (mod-sharding over the
flattened (host, chip) axis: owner flat shard = g % T with
T = H·C, owner host = shard // C, owner chip = shard % C, local row =
g // T), so flat and hierarchical programs are interchangeable on the
same checkpoint — only the exchange schedule differs.

SURVEY.md L1/L2 (all-to-all ID exchange, ID dedup); reference
file:line citations impossible (mount empty, SURVEY §0).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cffm_tpu.parallel import sharded_embedding as se


class HierRouting(NamedTuple):
    """Routing residuals of the two-stage exchange (per-device view)."""

    r1: se.Routing  # intra-host stage, over the "chip" axis
    r2: se.Routing  # inter-host stage, over the "host" axis (gateway)


def build_routing_hier(ids_flat: jax.Array, cap1: int, cap2: int,
                       host_axis: str, chip_axis: str,
                       rows_per_shard: int,
                       max_unique1: int | None = None,
                       max_unique2: int | None = None) -> HierRouting:
    """Two-stage dedup + bucket + all-to-all ID exchange.

    ids_flat: (n,) int32 global ids of this chip's batch shard.
    cap1: per (chip, gateway) bucket capacity (stage 1, ICI).
    cap2: per (gateway, owner-host) bucket capacity (stage 2, DCN).
    rows_per_shard: Vs = v_pad // (H*C), the per-chip table shard rows.
    max_unique1/2: static distinct-id bounds for the two dedup buffers
    (chip-level and host-level; optim.rowwise.unique_bound).
    """
    h = jax.lax.axis_size(host_axis)
    c = jax.lax.axis_size(chip_axis)
    vs = int(rows_per_shard)
    tt = h * c

    # stage-1 key: owner chip index major, then the stage-2 storage key
    # (owner host, local row) — so the gateway's received buckets are
    # each ascending in exactly the key its own sort consumes.
    s_owner = ids_flat % tt
    v = (s_owner // c) * vs + ids_flat // tt          # in [0, H*Vs)
    keys1 = (s_owner % c) * (h * vs) + v
    r1 = se.build_routing(v, cap1, chip_axis, rows_per_shard=h * vs,
                          max_unique=max_unique1, keys=keys1)

    # stage-2 on the gateway: received values ARE storage keys
    # (owner_host * Vs + local); sentinel H*Vs marks empty stage-1
    # slots and sorts past the last owner-host boundary.
    vals2 = r1.recv_ids.reshape(-1)
    r2 = se.build_routing(vals2, cap2, host_axis, rows_per_shard=vs,
                          max_unique=max_unique2, keys=vals2)
    return HierRouting(r1=r1, r2=r2)


def hier_routed_lookup(table_local: jax.Array, hr: HierRouting,
                       host_axis: str, chip_axis: str, out_dtype=None,
                       assume_no_overflow: Tuple[bool, bool] = (False, False)
                       ) -> jax.Array:
    """Serve + two-hop exchange + gather-back. Returns (n, W) rows for
    this chip's original flat positions (zeros for overflow ids unless
    the corresponding assume_no_overflow flag is set)."""
    c, cap1 = hr.r1.recv_ids.shape
    w = table_local.shape[1]
    # inter-host hop: the owner chip serves its shard's rows; the
    # gateway gets back rows for every received stage-1 position
    rows2 = se.routed_lookup(table_local, hr.r2, host_axis,
                             out_dtype=out_dtype,
                             assume_no_overflow=assume_no_overflow[1])
    # intra-host hop: the gateway's recovered rows, reshaped to the
    # stage-1 bucket layout, ARE the served buffer of stage 1
    served1 = rows2.reshape(c, cap1, w)
    return se.exchange_and_gather(served1, hr.r1, chip_axis,
                                  assume_no_overflow=assume_no_overflow[0])


def hier_grad_return(drows_flat: jax.Array, hr: HierRouting,
                     host_axis: str, chip_axis: str,
                     max_unique1: int | None = None,
                     max_unique2: int | None = None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Reverse path: per-chip dedup-sum + ICI all-to-all, then the
    HOST-LEVEL pre-sum + DCN all-to-all — each host-distinct row's
    gradient crosses DCN once.

    Returns (row_ids (H, cap2), grads (H, cap2, W)) in the owner's
    local row space, same contract as sharded_embedding.grad_return
    (ascending + unique per bucket, out-of-range sentinel in empty
    slots, GARBAGE grads in sentinel slots — consumers drop by id
    range; a row requested by several hosts appears once per bucket
    with that host's pre-sum, totalled by the bucketed apply kernel).
    """
    # stage 1: chip-level dedup-sum, buckets to the gateways over ICI
    _, g1 = se.grad_return(drows_flat, hr.r1, chip_axis,
                           max_unique=max_unique1)
    c, cap1, w = g1.shape
    # stage 2: the received per-chip partials sit at the gateway's
    # stage-2 input positions; its grad_return dedup-sums them across
    # the host's chips (host-level pre-sum: empty-slot garbage is keyed
    # to the sentinel segment and sliced out) and ships one bucket per
    # owner host over DCN.
    return se.grad_return(g1.reshape(c * cap1, w), hr.r2, host_axis,
                          max_unique=max_unique2)


def pick_capacities_hier(n_local: int, num_hosts: int, chips_per_host: int,
                         factor: float, rows_per_shard: int,
                         batch_unique: int, host_unique: int,
                         cap_rows: int = 0, cap_rows_host: int = 0
                         ) -> Tuple[int, int]:
    """Bucket capacities for the two stages.

    n_local: ids per chip (local_batch * num_fields).
    batch_unique: distinct-id bound for ONE chip's batch.
    host_unique: distinct-id bound for the whole HOST's batch (the
    stage-2 dedup is over the union of the host's chips).
    cap_rows / cap_rows_host: measured-occupancy absolute overrides
    for stage 1 / stage 2 (ShardingConfig; see pick_capacity).
    """
    cap1 = se.pick_capacity(n_local, chips_per_host, factor,
                            max_unique=min(batch_unique, n_local),
                            cap_rows=cap_rows)
    n2 = chips_per_host * cap1
    cap2 = se.pick_capacity(n2, num_hosts, factor,
                            rows_per_shard=rows_per_shard,
                            max_unique=host_unique,
                            cap_rows=cap_rows_host)
    return cap1, cap2


def hier_overflow(hr: HierRouting) -> jax.Array:
    """Dropped-unique count across both stages (per-device; psum me)."""
    return hr.r1.overflow + hr.r2.overflow
