"""Fused embedding gather + per-row Adagrad scatter Pallas kernels.

SURVEY.md L2's "fused gather" / "per-row optimizer colocated with
rows". XLA's dynamic gather on TPU measured ~15GB/s for 2.5KB rows
(26ms for a 4096x39 Criteo lookup); these kernels replace it with
deeply pipelined row DMAs straight out of HBM (the table never streams
through XLA's gather machinery), fusing the bf16 downcast of the
returned rows into the same pass.

Pattern: the ids ride in SMEM blocks, the table stays in HBM
(memory_space ANY), and each grid step keeps NBUF row-DMAs in flight
(pallas_guide.md "Async DMA" / "Double Buffering").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 16  # row DMAs kept in flight


def _auto_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Gather
# ---------------------------------------------------------------------------


def _gather_kernel(ids_ref, table_ref, out_ref, scratch, sems, *, g: int):
    """One grid step gathers g rows: table[ids[base+j]] -> out[j].

    ids arrive via scalar prefetch (a 1D blocked SMEM input crashes
    this jaxlib's compile helper), and the table is viewed (V, S, 128)
    so each row DMA moves an (S, 128) tile (single-row DMAs wider than
    128 lanes crash the AOT compiler) — see docs/PLATFORM_NOTES.md.
    """
    base = pl.program_id(0) * g

    def get_dma(slot, j):
        rid = ids_ref[base + j]
        return pltpu.make_async_copy(
            table_ref.at[rid], scratch.at[slot], sems.at[slot]
        )

    # warm up the pipeline
    for j in range(min(NBUF, g)):
        get_dma(j, j).start()

    def body(j, _):
        slot = jax.lax.rem(j, NBUF)
        get_dma(slot, j).wait()
        out_ref[j] = scratch[slot].astype(out_ref.dtype)

        @pl.when(j + NBUF < g)
        def _():
            get_dma(slot, j + NBUF).start()

        return 0

    jax.lax.fori_loop(0, g, body, 0)


def gather_rows(table: jax.Array, ids: jax.Array, out_dtype=None,
                group: int = 512, interpret: bool | None = None) -> jax.Array:
    """table: (V, W). ids: (N,) int32 in [0, V). Returns (N, W) out_dtype.

    N must be a multiple of `group` (callers pad; model batch x fields
    always is for the standard configs).
    """
    if interpret is None:
        interpret = _auto_interpret()
    v, w = table.shape
    assert w % 128 == 0, f"gather_rows needs 128-multiple row width, got {w}"
    s = w // 128
    n = ids.shape[0]
    out_dtype = out_dtype or table.dtype
    if n % group != 0:
        pad = -n % group
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
        out = gather_rows(table, ids, out_dtype, group, interpret)
        return out[:n]

    kernel = functools.partial(_gather_kernel, g=group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // group,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec((group, s, 128), lambda i, ids: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, s, 128), table.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, s, 128), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids, table.reshape(v, s, 128))
    return out3.reshape(n, w)


# ---------------------------------------------------------------------------
# Fused per-row Adagrad scatter-update
# ---------------------------------------------------------------------------


def _adagrad_kernel(ids_all_ref, hyper_ref, grads_ref, table_ref, accum_ref,
                    table_out, accum_out, row_buf, acc_buf, sems, asems,
                    *, g: int):
    """RMW per unique row: accum += mean(g^2); row -= lr*g/sqrt(accum+eps).

    table_ref/accum_ref are HBM refs ALIASED to the outputs (in-place).
    ids are pre-deduped (duplicates summed); id < 0 slots are skipped.
    ids + hyperparams arrive via scalar prefetch.
    """
    lr = hyper_ref[0]
    eps = hyper_ref[1]
    _base = pl.program_id(0) * g

    def ids_ref(j):
        return ids_all_ref[_base + j]

    def row_dma(slot, j):
        rid = jnp.maximum(ids_ref(j), 0)
        return pltpu.make_async_copy(table_ref.at[rid], row_buf.at[slot],
                                     sems.at[slot])

    def acc_dma(slot, j):
        rid = jnp.maximum(ids_ref(j), 0)
        return pltpu.make_async_copy(accum_ref.at[rid], acc_buf.at[slot],
                                     asems.at[slot])

    def row_wb(slot, j):
        rid = jnp.maximum(ids_ref(j), 0)
        return pltpu.make_async_copy(row_buf.at[slot], table_out.at[rid],
                                     sems.at[slot])

    def acc_wb(slot, j):
        rid = jnp.maximum(ids_ref(j), 0)
        return pltpu.make_async_copy(acc_buf.at[slot], accum_out.at[rid],
                                     asems.at[slot])

    half = NBUF // 2  # half the slots prefetch, half write back

    for j in range(min(half, g)):
        @pl.when(ids_ref(j) >= 0)
        def _(j=j):
            row_dma(j, j).start()
            acc_dma(j, j).start()

    def body(j, _):
        slot = jax.lax.rem(j, half)
        valid = ids_ref(j) >= 0

        @pl.when(valid)
        def _():
            row_dma(slot, j).wait()
            acc_dma(slot, j).wait()
            grad = grads_ref[j].astype(jnp.float32)
            row = row_buf[slot].astype(jnp.float32)
            acc = acc_buf[slot].astype(jnp.float32)
            g2 = jnp.mean(grad * grad)
            new_acc = acc + g2
            new_row = row - lr * grad / (jnp.sqrt(new_acc) + eps)
            row_buf[slot] = new_row.astype(row_buf.dtype)
            acc_buf[slot] = new_acc.astype(acc_buf.dtype)
            row_wb(slot, j).start()
            acc_wb(slot, j).start()
            # wait for write-back before the slot is reused
            row_wb(slot, j).wait()
            acc_wb(slot, j).wait()

        @pl.when((j + half < g) & (ids_ref(jnp.minimum(j + half, g - 1)) >= 0))
        def _():
            row_dma(slot, j + half).start()
            acc_dma(slot, j + half).start()

        return 0

    jax.lax.fori_loop(0, g, body, 0)


def adagrad_update_rows(table: jax.Array, accum: jax.Array, ids: jax.Array,
                        grads: jax.Array, lr: float, eps: float,
                        group: int = 512,
                        interpret: bool | None = None):
    """In-place-ish per-row Adagrad on (pre-deduped) rows.

    table (V, W) f32, accum (V, 1) f32, ids (N,) int32 (-1 = skip),
    grads (N, W) f32. Returns (new_table, new_accum) aliased to inputs.
    """
    if interpret is None:
        interpret = _auto_interpret()
    v, w = table.shape
    n = ids.shape[0]
    if n % group != 0:
        pad = -n % group
        ids = jnp.concatenate([ids, jnp.full((pad,), -1, ids.dtype)])
        grads = jnp.concatenate([grads, jnp.zeros((pad, w), grads.dtype)])
        n = ids.shape[0]

    assert w % 128 == 0, f"adagrad_update_rows needs 128-multiple width, got {w}"
    s = w // 128
    hyper = jnp.asarray([lr, eps], jnp.float32)
    kernel = functools.partial(_adagrad_kernel, g=group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, hyper
        grid=(n // group,),
        in_specs=[
            pl.BlockSpec((group, s, 128), lambda i, ids, hyp: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF // 2, s, 128), table.dtype),
            pltpu.VMEM((NBUF // 2, 1), accum.dtype),
            pltpu.SemaphoreType.DMA((NBUF // 2,)),
            pltpu.SemaphoreType.DMA((NBUF // 2,)),
        ],
    )
    new_t, new_a = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((v, s, 128), table.dtype),
            jax.ShapeDtypeStruct((v, 1), accum.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(ids, hyper, grads.reshape(n, s, 128), table.reshape(v, s, 128), accum)
    return new_t.reshape(v, w), new_a


# ---------------------------------------------------------------------------
# Generic unique-row scatter-add (v2): the fast sparse-update primitive
# ---------------------------------------------------------------------------
#
# table[ids[k]] += deltas[k] for k < nuniq, where ids[:nuniq] are UNIQUE
# (pre-deduped) and form a prefix (rowwise dedup emits exactly this).
# Each row is an HBM read-modify-write via (S, 128)-tile DMAs with NBUF
# slots in flight; iteration bodies are statically unrolled (dynamic
# 3D stores / wide 1D DMAs crash this jaxlib's AOT compiler).


def _scatter_add_kernel(ids_ref, meta_ref, delta_ref, table_ref, table_out,
                        rows, rsems, wsems, *, g: int, s: int):
    """Three-phase RMW per grid step (compile-fast fori form):
      A) gather the g rows into a VMEM block (per-row DMA, unique
         destinations -> no buffer hazards, ~70GB/s),
      B) one bulk vectorized add of the delta block,
      C) scatter-write the block back (mirrored DMA pattern).
    Per-row dynamic vector ops (the v2 RMW pipeline) measured ~320ns/row;
    bulk phases avoid them entirely.
    """
    base = pl.program_id(0) * g
    nuniq = meta_ref[0]
    a = jnp.clip(nuniq - base, 0, g)  # active prefix length this step

    def read_dma(j):
        rid = ids_ref[base + j] * s
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(rid, s), :],
            rows.at[pl.ds(j * s, s), :], rsems.at[jax.lax.rem(j, NBUF)])

    def write_dma(j):
        rid = ids_ref[base + j] * s
        return pltpu.make_async_copy(
            rows.at[pl.ds(j * s, s), :],
            table_out.at[pl.ds(rid, s), :], wsems.at[jax.lax.rem(j, NBUF)])

    # --- phase A: gather ---
    def warm_r(j, _):
        @pl.when(j < a)
        def _():
            read_dma(j).start()
        return 0

    jax.lax.fori_loop(0, min(NBUF, g), warm_r, 0)

    def body_r(j, _):
        @pl.when(j < a)
        def _():
            read_dma(j).wait()

        @pl.when(j + NBUF < a)
        def _():
            read_dma(j + NBUF).start()
        return 0

    jax.lax.fori_loop(0, g, body_r, 0)

    # --- phase B: bulk add (padding rows add garbage to garbage; the
    # write phase only persists the active prefix) ---
    rows[...] = (rows[...].astype(jnp.float32)
                 + delta_ref[...].astype(jnp.float32)).astype(rows.dtype)

    # --- phase C: scatter write-back ---
    def warm_w(j, _):
        @pl.when(j < a)
        def _():
            write_dma(j).start()
        return 0

    jax.lax.fori_loop(0, min(NBUF, g), warm_w, 0)

    def body_w(j, _):
        @pl.when(j < a)
        def _():
            write_dma(j).wait()

        @pl.when(j + NBUF < a)
        def _():
            write_dma(j + NBUF).start()
        return 0

    jax.lax.fori_loop(0, g, body_w, 0)


def scatter_add_rows(table: jax.Array, ids: jax.Array, nuniq: jax.Array,
                     deltas: jax.Array, group: int = 256,
                     interpret: bool | None = None) -> jax.Array:
    """table (V, W) += deltas at unique prefix rows. W % 128 == 0.

    ids: (N,) int32, unique valid ids in [0, V) occupying [0, nuniq);
    entries past nuniq are ignored. deltas: (N, W), any float dtype.
    Returns the updated table (input aliased/donated).
    """
    if interpret is None:
        interpret = _auto_interpret()
    v, w = table.shape
    assert w % 128 == 0, f"scatter_add_rows needs 128-multiple width, got {w}"
    s = w // 128
    n = ids.shape[0]
    if n % group != 0:
        pad = -n % group
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
        deltas = jnp.concatenate(
            [deltas, jnp.zeros((pad, w), deltas.dtype)])
        n = ids.shape[0]

    meta = jnp.asarray([nuniq], jnp.int32).reshape(1)
    kernel = functools.partial(_scatter_add_kernel, g=group, s=s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, meta
        grid=(n // group,),
        in_specs=[
            pl.BlockSpec((group * s, 128), lambda i, ids, meta: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((group * s, 128), table.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v * s, 128), table.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(ids, meta, deltas.reshape(n * s, 128), table.reshape(v * s, 128))
    return out.reshape(v, w)
