"""Streamed per-row sparse-update Pallas kernel (adagrad / sgd).

Why: XLA's scatter-add on TPU is latency-bound per index slot — measured
80 ms for 1.27M row-updates into the 6.6 GB Criteo table (~40 GB/s,
~8x off HBM speed), dominating the train step. This kernel applies the
same dedup'd updates by STREAMING the table through VMEM in R-row tiles
(contiguous DMA at full HBM bandwidth) and scattering each tile's
updates with one-hot MXU matmuls — no per-row dynamic ops anywhere.

Contract (matches optim.rowwise._dedup_sum output):
  uids (M,) int32 ascending; unique valid prefix in [0, V); the invalid
  tail holds the sentinel V (>= every tile range, so it never matches).
  gsum (M, W) duplicate-summed gradients (zeros in the tail); bf16
  preferred (halves the dominant window DMA traffic), f32 accepted.

Per tile t covering rows [tR, tR+R):
  - its entries occupy a CONTIGUOUS slice of (uids, gsum) — at most R of
    them (unique ids within R rows) — so a window of WINB fixed
    128-entry blocks starting at block lo[t]//128 always covers them
    (lo = searchsorted(uids, tile_starts), computed outside the kernel;
    WINB = (R-1)//128 + 2);
  - the full uids array stays VMEM-resident (M*4 bytes, a few MB; the
    TPU lowering rejects (1, 128) blocked int32 inputs, and whole-array
    residency makes the window slice a cheap in-VMEM read);
  - per window block k: onehot_k[r, e] = (uids[lo+k, e] - tR == r)
    selects exactly the tile's entries in that block; out-of-tile and
    sentinel entries contribute zero columns;
  - ONE matmul pass gathers each row's summed gradient:
      S = sum_k onehot_k(bf16) @ g_k(bf16)        (R, W) f32 accum
    then everything else is row-local VPU math:
      adagrad: acc_new = acc + mean(S^2, axis=1); delta = -lr*S/(sqrt(
      acc_new)+eps); sgd: delta = -lr*S — identical to the sparse
      scatter path for touched rows (S == the dedup-summed grad, bf16-
      rounded per entry); untouched rows see S = 0 => delta 0 and acc+0,
      an exact no-op (modulo the +0.0 identity: a stored -0.0 would
      renormalize to +0.0).
  - table_out = table_in + delta in f32 — the delta itself is no longer
    bf16-rounded (only the gradient inputs are), tightening the old
    formulation's error.

The tile size need not divide V (the final partial tile is masked on
store; see pick_tile); tables smaller than the minimum tile fall back
to the XLA scatter path in optim.rowwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 128  # entry-window block: one uids row / one (EB, W) gsum block
MAX_RESIDENT_IDS_BYTES = 32 * 1024 * 1024  # uids VMEM residency guard


def _auto_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def pick_tile(num_rows: int) -> int:
    """Largest supported tile size (0 = table too small to stream).

    The tile need NOT divide num_rows: the grid rounds up and Mosaic
    masks the final partial block on store. The sentinel id (== V)
    falls inside the last tile's PADDED region, so its one-hot match
    lands on a masked row — and its gsum is zero anyway. Bigger tiles
    amortize per-step grid overhead and window overfetch (the window
    reads winb fixed blocks per tile regardless of how many entries
    actually fall in the tile)."""
    for r in (512, 256, 128, 64):
        if num_rows >= r:
            return r
    return 0


def win_blocks(r: int) -> int:
    """Window blocks: <= r entries starting anywhere within a block."""
    return (r - 1) // EB + 2


def padded_entries(m: int, r: int) -> int:
    """Entry-array length that makes every window block index valid.

    Idempotent: an EB-multiple of at least winb blocks passes through
    unchanged (the kernel clamps window starts so the LAST winb blocks
    cover any tile whose entries run to the array end — entries per
    tile <= r <= (winb-1)*EB, so a clamped window loses nothing). A
    non-idempotent +winb*EB tail here used to make the apply re-pad
    entries the caller had already sized (a 3.4 ms concat at criteo
    bench shapes)."""
    return max(-(-m // EB), win_blocks(r)) * EB


def supported(num_rows: int, width: int, m: int) -> bool:
    r = pick_tile(num_rows)
    return (r > 0 and width % 128 == 0
            and padded_entries(m, r) * 4 <= MAX_RESIDENT_IDS_BYTES)


def _kernel(lo_ref, hyper_ref, *refs, r: int, winb: int, mode: str,
            stochastic: bool, nt: int, nb: int = 1, clip: float = 0.0):
    """refs: uids (NB*C/EB, EB) i32 resident, g_{o,k} for o in [0,NB),
    k in [0,winb) as NB*winb (EB, W) window blocks, then mode-dependent
    ins/outs:
      sgd:          table_in | table_out
      adagrad:      table_in, acc_in (R,1) | table_out, acc_out
      rowwise_adam: table_in, m_in (R,W) f32, v_in (R,1) | table_out,
                    m_out, v_out   (full first moment streams with the
                    table; row-scalar second moment like adagrad).

    nb: number of entry buckets (1 = the flat dedup'd stream; T for the
    sharded path's per-peer all-to-all buckets — each bucket ascending
    and unique WITHIN itself; a row present in several buckets gets its
    bucket partials summed here, BEFORE the optimizer math, which keeps
    nonlinear updates (adagrad's mean(S^2), adam's moments) exact).
    clip: per-row L2 clip applied to the summed gradient S (0 = off) —
    on the bucketed path the total only exists inside this kernel, so
    the clip must live here too (optim.rowwise.clip_rows semantics).
    lo_ref layout: [tile*nb + o] -> global EB-block index of bucket o's
    window start for this tile; the stochastic-rounding seed rides at
    lo_ref[nt*nb]."""
    u_ref = refs[0]
    ng = nb * winb
    g_refs = refs[1 : 1 + ng]
    if mode == "adagrad":
        table_in, acc_in, table_out, acc_out = refs[1 + ng : 5 + ng]
    elif mode == "rowwise_adam":
        (table_in, m_in, v_in,
         table_out, m_out, v_out) = refs[1 + ng : 7 + ng]
    else:
        table_in, table_out = refs[1 + ng : 3 + ng]

    lr = hyper_ref[0]
    eps = hyper_ref[1]
    t = pl.program_id(0)
    base = t * r
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r, EB), 0)

    # One matmul pass: per-row summed gradient S (R, W) in f32.
    s = jnp.zeros((r, table_in.shape[1]), jnp.float32)
    nmatch = jnp.zeros((r, 1), jnp.float32)
    for o in range(nb):
        lo = lo_ref[t * nb + o]
        for k in range(winb):
            u_k = u_ref[pl.ds(lo + k, 1), :]  # (1, EB) int32
            onehot_k = (u_k - base) == iota_r  # (R, EB)
            s = s + jax.lax.dot_general(
                onehot_k.astype(jnp.bfloat16),
                g_refs[o * winb + k][...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            if mode == "rowwise_adam":
                nmatch = nmatch + jnp.sum(onehot_k, axis=1, keepdims=True,
                                          dtype=jnp.float32)
    if clip > 0.0:
        norm = jnp.sqrt(jnp.sum(s * s, axis=1, keepdims=True))
        s = s * jnp.minimum(1.0, clip / jnp.maximum(norm, 1e-12))

    if mode == "adagrad":
        acc_new = acc_in[...] + jnp.mean(s * s, axis=1, keepdims=True)
        acc_out[...] = acc_new
        delta = (-lr) * s / (jnp.sqrt(acc_new) + eps)
    elif mode == "rowwise_adam":
        # adagrad's S=0 => no-op identity does NOT hold for adam (decay
        # would touch every row); mask to rows actually present in uids
        # — exactly the scatter path's touched-row semantics.
        touched = nmatch > 0
        b1, b2, c1, c2 = (hyper_ref[2], hyper_ref[3], hyper_ref[4],
                          hyper_ref[5])
        m_new = jnp.where(touched, b1 * m_in[...] + (1.0 - b1) * s, m_in[...])
        v_new = jnp.where(
            touched,
            b2 * v_in[...] + (1.0 - b2) * jnp.mean(s * s, axis=1,
                                                   keepdims=True),
            v_in[...])
        m_out[...] = m_new
        v_out[...] = v_new
        delta = jnp.where(
            touched,
            (-lr) * (m_new * c1) / (jnp.sqrt(v_new * c2) + eps), 0.0)
    else:
        delta = (-lr) * s
    if table_in.dtype == jnp.bfloat16:
        # bf16 table: f32 add then round back per tile. Stochastic
        # rounding (per-tile-seeded hardware PRNG) keeps sub-ulp deltas
        # in expectation; untouched rows have delta exactly 0 and any
        # rounding of an exact bf16 value is the identity.
        newv = table_in[...].astype(jnp.float32) + delta
        if stochastic:
            # seed rides at lo_ref[nt*nb] (appended past the per-tile
            # lo entries); + t decorrelates the tiles' dither streams.
            pltpu.prng_seed(lo_ref[nt * nb] + t)
            bits = pltpu.bitcast(
                pltpu.prng_random_bits(newv.shape), jnp.uint32)
            table_out[...] = pltpu.stochastic_round(
                newv, bits, target_dtype=jnp.bfloat16)
        else:
            table_out[...] = newv.astype(jnp.bfloat16)
    else:
        table_out[...] = table_in[...] + delta


def streamed_rowwise_adam_apply(
    table: jax.Array,
    m: jax.Array,
    v_state: jax.Array,
    uids: jax.Array,
    gsum: jax.Array,
    lr: float | jax.Array,
    eps: float | jax.Array,
    b1: float,
    b2: float,
    t_step: jax.Array,
    r: int | None = None,
    interpret: bool | None = None,
    sr_seed: jax.Array | None = None,
):
    """Streamed rowwise-Adam (optim.rowwise semantics): full first
    moment m (V, W) f32 streams tile-for-tile with the table; second
    moment v (V, 1) row-scalar. Rows absent from uids keep table/m/v
    bit-exactly (touched-row mask from the one-hot match counts).
    t_step: the POST-increment Adam timestep (state["t"] + 1), used for
    bias correction. Returns (new_table, new_m, new_v)."""
    t_f = t_step.astype(jnp.float32)
    c1 = 1.0 / (1.0 - jnp.float32(b1) ** t_f)
    c2 = 1.0 / (1.0 - jnp.float32(b2) ** t_f)
    extra = jnp.stack([jnp.asarray(b1, jnp.float32),
                       jnp.asarray(b2, jnp.float32), c1, c2])
    return _streamed_apply(table, (m, v_state), uids, gsum, lr, eps,
                           mode="rowwise_adam", extra_hyper=extra, r=r,
                           interpret=interpret, sr_seed=sr_seed)


def streamed_rowwise_apply(
    table: jax.Array,
    accum: jax.Array | None,
    uids: jax.Array,
    gsum: jax.Array,
    lr: float | jax.Array,
    eps: float | jax.Array,
    r: int | None = None,
    interpret: bool | None = None,
    sr_seed: jax.Array | None = None,
):
    """Apply -lr*g/(sqrt(acc)+eps) (adagrad) or -lr*g (sgd) at unique rows.

    table (V, W) f32 OR bf16 with W % 128 == 0 and pick_tile(V) > 0;
    accum (V, 1) f32 or None; uids/gsum per the module contract.
    sr_seed: int32 scalar enabling stochastic rounding for bf16 tables
    (None = round-to-nearest). Returns (new_table, new_accum).
    """
    mode = "adagrad" if accum is not None else "sgd"
    state = (accum,) if accum is not None else ()
    out = _streamed_apply(table, state, uids, gsum, lr, eps, mode=mode,
                          extra_hyper=None, r=r, interpret=interpret,
                          sr_seed=sr_seed)
    if accum is not None:
        return out
    return out[0], None


def bucketed_tile(num_rows: int, width: int, nb: int, c: int) -> int:
    """Tile size for the BUCKETED apply (0 = unsupported). Each bucket
    needs c >= winb(r)*EB so a winb-block window clamped inside the
    bucket still covers any tile's entries, c must be EB-aligned (the
    bucket boundary must fall on a window-block boundary), and the
    resident flat id array must fit the VMEM guard."""
    if width % 128 != 0 or c % EB != 0 or nb * c * 4 > MAX_RESIDENT_IDS_BYTES:
        return 0
    for r in (512, 256, 128, 64):
        if num_rows >= r and c >= win_blocks(r) * EB:
            return r
    return 0


def bucketed_rowwise_apply(
    table: jax.Array,
    accum: jax.Array | None,
    ids_bkt: jax.Array,
    g_bkt: jax.Array,
    lr: float | jax.Array,
    eps: float | jax.Array,
    clip: float = 0.0,
    r: int | None = None,
    interpret: bool | None = None,
    sr_seed: jax.Array | None = None,
):
    """Adagrad/SGD apply straight from the sharded gradient-return
    buckets: ids_bkt (NB, C) ascending + unique per bucket with the
    out-of-range sentinel (>= V) in empty slots; g_bkt (NB, C, W) the
    per-bucket dedup-summed grads (garbage in sentinel slots — they
    deposit nowhere). Cross-bucket duplicates are summed in-kernel
    before the optimizer math; `clip` applies optim.rowwise.clip_rows'
    per-row L2 clip to that total. Returns (new_table, new_accum)."""
    mode = "adagrad" if accum is not None else "sgd"
    state = (accum,) if accum is not None else ()
    out = _streamed_apply(table, state, ids_bkt, g_bkt, lr, eps, mode=mode,
                          extra_hyper=None, clip=clip, r=r,
                          interpret=interpret, sr_seed=sr_seed)
    if accum is not None:
        return out
    return out[0], None


def bucketed_rowwise_adam_apply(
    table: jax.Array,
    m: jax.Array,
    v_state: jax.Array,
    ids_bkt: jax.Array,
    g_bkt: jax.Array,
    lr: float | jax.Array,
    eps: float | jax.Array,
    b1: float,
    b2: float,
    t_step: jax.Array,
    clip: float = 0.0,
    r: int | None = None,
    interpret: bool | None = None,
    sr_seed: jax.Array | None = None,
):
    """Bucketed-input twin of streamed_rowwise_adam_apply (see
    bucketed_rowwise_apply for the bucket contract)."""
    t_f = t_step.astype(jnp.float32)
    c1 = 1.0 / (1.0 - jnp.float32(b1) ** t_f)
    c2 = 1.0 / (1.0 - jnp.float32(b2) ** t_f)
    extra = jnp.stack([jnp.asarray(b1, jnp.float32),
                       jnp.asarray(b2, jnp.float32), c1, c2])
    return _streamed_apply(table, (m, v_state), ids_bkt, g_bkt, lr, eps,
                           mode="rowwise_adam", extra_hyper=extra, clip=clip,
                           r=r, interpret=interpret, sr_seed=sr_seed)


def _streamed_apply(
    table: jax.Array,
    state_arrays: tuple,
    uids: jax.Array,
    gsum: jax.Array,
    lr: float | jax.Array,
    eps: float | jax.Array,
    *,
    mode: str,
    extra_hyper: jax.Array | None,
    clip: float = 0.0,
    r: int | None = None,
    interpret: bool | None = None,
    sr_seed: jax.Array | None = None,
):
    """uids (M,)/gsum (M, W) = single flat stream; uids (NB, C)/
    gsum (NB, C, W) = NB per-bucket streams (the flat case is exactly
    NB=1 internally)."""
    if interpret is None:
        interpret = _auto_interpret()
    v, w = table.shape
    assert w % 128 == 0, f"streamed update needs 128-multiple width, got {w}"
    bucketed = uids.ndim == 2
    # Interpret mode (CPU tests) lacks the TPU PRNG primitives
    # (prng_seed has no CPU lowering), so bf16 tables round to nearest
    # there; the stochastic path is exercised on real silicon
    # (NEXT_EXPERIMENTS #8 flagship bf16 learn check). The SR math
    # itself is CPU-tested via the scatter path (ops/rounding.py).
    stochastic = (table.dtype == jnp.bfloat16 and sr_seed is not None
                  and not interpret)
    gsum = gsum.astype(jnp.bfloat16)  # window DMA traffic dominates

    if bucketed:
        nb, c = uids.shape
        if r is None:
            r = bucketed_tile(v, w, nb, c)
        assert r and c % EB == 0 and c >= win_blocks(r) * EB, (
            f"unsupported bucket shape ({nb}, {c}) for table {v}x{w}")
        winb = win_blocks(r)
        gsum = gsum.reshape(nb * c, w)
        uids_flat = uids.reshape(-1)
        cb = c // EB
        m_pad = nb * c
    else:
        if r is None:
            r = pick_tile(v)
        assert r, f"table too small to stream: num_rows={v}"
        winb = win_blocks(r)
        nb = 1
        # Pad entries so every window block index is valid (no-op when
        # the caller pre-sized M via padded_entries).
        m = uids.shape[0]
        m_pad = padded_entries(m, r)
        if m_pad != m:
            uids = jnp.concatenate([uids, jnp.full((m_pad - m,), v, jnp.int32)])
            gsum = jnp.concatenate([gsum, jnp.zeros((m_pad - m, w), gsum.dtype)])
        uids_flat = uids
        cb = m_pad // EB

    # Per-(tile, bucket) first-entry offset -> window start block
    # (scalar prefetch), window clamped INSIDE the bucket so no block
    # ever straddles two buckets (a straddling window would deposit the
    # next bucket's entries twice).
    t_full = -(-v // r)
    tile_starts = jnp.arange(t_full, dtype=jnp.int32) * r
    lo = jax.vmap(lambda u: jnp.searchsorted(u, tile_starts))(
        uids_flat.reshape(nb, -1)).astype(jnp.int32)       # (nb, t_full)
    lo_blk = (jnp.minimum(lo // EB, cb - winb)
              + (jnp.arange(nb, dtype=jnp.int32) * cb)[:, None])
    # kernel indexes lo_ref[tile*nb + o]
    lo_flat = lo_blk.T.reshape(-1)
    # stochastic-rounding seed rides as one extra int32 past the tiles
    seed = (sr_seed if stochastic
            else jnp.zeros((), jnp.int32)).astype(jnp.int32)
    lo_flat = jnp.concatenate([lo_flat, seed[None]])

    hyper = jnp.stack([jnp.asarray(lr, jnp.float32),
                       jnp.asarray(eps, jnp.float32)])
    if extra_hyper is not None:
        hyper = jnp.concatenate([hyper, extra_hyper])
    uids2d = uids_flat.reshape(m_pad // EB, EB)

    uids_spec = pl.BlockSpec((m_pad // EB, EB),
                             lambda t, lo_ref, hyp: (0, 0),
                             memory_space=pltpu.VMEM)

    def g_spec(o, k):
        return pl.BlockSpec(
            (EB, w), lambda t, lo_ref, hyp: (lo_ref[t * nb + o] + k, 0),
            memory_space=pltpu.VMEM)

    tile_spec = pl.BlockSpec((r, w), lambda t, lo_ref, hyp: (t, 0),
                             memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((r, 1), lambda t, lo_ref, hyp: (t, 0),
                            memory_space=pltpu.VMEM)

    ng = nb * winb
    in_specs = ([uids_spec]
                + [g_spec(o, k) for o in range(nb) for k in range(winb)]
                + [tile_spec])
    in_arrays = [uids2d] + [gsum] * ng + [table]
    out_shape = [jax.ShapeDtypeStruct((v, w), table.dtype)]
    out_specs = [tile_spec]
    # alias keys count the scalar-prefetch operands (lo_flat, hyper)
    io_aliases = {3 + ng: 0}
    # per-mode state arrays stream tile-for-tile, in/out aliased like
    # the table: adagrad (V,1) accum; rowwise_adam (V,W) m + (V,1) v
    state_specs = {"sgd": (), "adagrad": (acc_spec,),
                   "rowwise_adam": (tile_spec, acc_spec)}[mode]
    for i, (arr, spec) in enumerate(zip(state_arrays, state_specs)):
        in_specs.append(spec)
        in_arrays.append(arr)
        out_shape.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
        out_specs.append(spec)
        io_aliases[4 + ng + i] = 1 + i

    kernel = functools.partial(_kernel, r=r, winb=winb, mode=mode,
                               stochastic=stochastic, nt=t_full, nb=nb,
                               clip=float(clip))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_full,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lo_flat, hyper, *in_arrays)
    return tuple(outs)
