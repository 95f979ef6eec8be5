"""Stochastic rounding f32 -> bf16 for low-precision embedding tables.

Why: a bf16 table halves both the table's HBM footprint and the
lookup-gather traffic (the single largest HBM consumer in the CFFM
step), but round-to-nearest updates silently drop any per-step delta
smaller than the row value's bf16 ulp — exactly the regime sparse
CTR embeddings live in (lr*grad ~ 1e-4 against weights ~ 1e-1 after
warm-up). Stochastic rounding keeps the UPDATE EXPECTATION exact:
round up with probability proportional to the dropped fraction, so
tiny deltas accumulate correctly over steps (the standard low-precision
-training recipe; see PAPERS.md mixed-precision notes).

Implementation: bf16 is the top 16 bits of the f32 pattern, and IEEE
bit patterns are monotone within a sign, so adding a uniform 16-bit
integer to the f32 bits and truncating the low 16 implements exact
stochastic rounding across mantissa AND binade boundaries (the carry
ripples into the exponent precisely when the value crosses to the next
representable bf16). Cost: one PRNG draw + integer add per element —
fuses into the surrounding scatter/stream on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """Round f32 `x` to bf16 stochastically (unbiased). NaN/inf pass
    through unperturbed (their payload bits must not be dithered)."""
    assert x.dtype == jnp.float32, x.dtype
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    dither = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    finite = jnp.isfinite(x)
    rounded = (bits + jnp.where(finite, dither, 0)) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)


def round_table_delta(rows: jax.Array, delta: jax.Array, dtype,
                      rounding: str, key: jax.Array | None) -> jax.Array:
    """rows(+delta) in the table's storage dtype.

    rows: current row values (any float dtype, promoted to f32 here);
    delta: f32 update. For f32 tables this is a plain add; for bf16
    tables `rounding` picks nearest (deterministic) or stochastic."""
    new = rows.astype(jnp.float32) + delta
    if jnp.dtype(dtype) != jnp.bfloat16:
        return new.astype(dtype)
    if rounding == "stochastic":
        if key is None:
            raise ValueError("stochastic table rounding needs an rng key")
        return stochastic_round_bf16(new, key)
    if rounding == "nearest":
        return new.astype(jnp.bfloat16)
    raise ValueError(f"unknown table_rounding {rounding!r}")
