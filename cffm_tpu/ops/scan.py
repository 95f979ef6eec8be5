"""MXU block prefix-sum: jnp.cumsum for large int streams.

XLA's TPU cumsum lowering on a 1.28M-element i32 stream measured
~5-11 ms inside the routing fusions (scripts/trace_sharded.py
2026-08-20) — orders of magnitude off the ~0.3 ms a bandwidth-bound
scan should cost. This formulation does the within-block prefix as ONE
(n/128, 128) @ (128, 128) triangular matmul (MXU, exact for integer
values < 2^24 in f32) and keeps only a 128x-shorter block-level
cumsum on the slow path; one recursion level bounds that at n/16384
elements.

Used by parallel/sharded_embedding.build_routing (segment indices over
the sorted id stream) and ops/sorted_segment.sorted_segment_sum_compact.
"""

from __future__ import annotations

import jax.numpy as jnp

# inclusive-prefix matmul operand: tri[k, j] = 1 iff k <= j
_BLK = 128


def cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a 1-D int array with small non-negative
    elements. Exactness holds while the TOTAL stays < 2^24 (f32
    integer range); callers here count segment starts (total <= n),
    asserted below. Falls back to jnp.cumsum for tiny inputs."""
    (n,) = x.shape
    assert n < (1 << 24), "f32 block cumsum needs total < 2^24"
    if n <= 2 * _BLK:
        return jnp.cumsum(x)
    pad = (-n) % _BLK
    xf = jnp.pad(x, (0, pad)).astype(jnp.float32).reshape(-1, _BLK)
    tri = jnp.triu(jnp.ones((_BLK, _BLK), jnp.float32))  # k<=j upper tri
    within = xf @ tri                                    # (nb, BLK) inclusive
    block_sums = within[:, -1].astype(jnp.int32)         # (nb,)
    nb = block_sums.shape[0]
    # exclusive block offsets; recurse once if the block level is still big
    if nb > 2 * _BLK:
        incl = cumsum_i32(block_sums)
    else:
        incl = jnp.cumsum(block_sums)
    excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), incl[:-1]])
    out = within.astype(jnp.int32) + excl[:, None]
    return out.reshape(-1)[:n]
