"""CFFM model: embeddings -> pairwise cross -> conv core -> MLP tower.

Functional (pure-pytree) implementation; no Module framework. The
lookup is deliberately split from the rest of the forward so the
row-sharded embedding engine (cffm_tpu/parallel/sharded_embedding.py)
can substitute its all-to-all lookup, and so the train step can take
grads w.r.t. the looked-up rows for the colocated per-row sparse
optimizer (SURVEY.md §4.1).

Model math per SURVEY.md §1.1; stack per BASELINE.json "north_star".
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu.config import ModelConfig
from cffm_tpu.ops.cross import build_cross_map, conv_core_reference


def field_offsets(cfg: ModelConfig) -> np.ndarray:
    """Per-field starting offset into the single combined vocab space."""
    return np.concatenate([[0], np.cumsum(cfg.vocab_sizes)[:-1]]).astype(np.int64)


def init_params(key: jax.Array, cfg: ModelConfig, skip_tables: bool = False
                ) -> Dict:
    """Initialize all parameters as a flat-ish pytree dict.

    Tables: N(0, 0.01) (FM-family convention). Conv/tower: He for
    ReLU layers, Glorot for the final logit layer.
    skip_tables: omit the (vocab, W) tables — for sharded-state
    creation, which re-draws them at padded size anyway (materializing
    a throwaway multi-GB f32 table here put the transient HBM peak
    over the top at criteo_full shapes).
    """
    keys = jax.random.split(key, 8)
    pdt = jnp.dtype(cfg.param_dtype)
    tdt = jnp.dtype(cfg.table_dtype)
    params = {}

    # Tables are drawn in f32 then cast so a bf16 table is the rounding
    # of the f32 one (same seed => comparable init across table_dtype).
    params["embed"] = {} if skip_tables else {
        "table": (0.01 * jax.random.normal(
            keys[0], (cfg.total_vocab, cfg.table_width), dtype=jnp.float32)
        ).astype(tdt)
    }
    if cfg.use_first_order:
        params["linear"] = {"bias": jnp.zeros((), dtype=pdt)}
        if not cfg.fused_linear and not skip_tables:
            params["linear"]["table"] = (0.01 * jax.random.normal(
                keys[1], (cfg.total_vocab, 1), dtype=jnp.float32)).astype(tdt)

    conv_layers = []
    in_ch = cfg.num_pairs
    ck = jax.random.split(keys[2], max(len(cfg.conv_channels), 1))
    for li, out_ch in enumerate(cfg.conv_channels):
        fan_in = in_ch * cfg.conv_kernel
        w = jax.random.normal(ck[li], (out_ch, in_ch, cfg.conv_kernel), dtype=pdt)
        conv_layers.append(
            {"w": w * jnp.asarray(np.sqrt(2.0 / fan_in), pdt), "b": jnp.zeros((out_ch,), pdt)}
        )
        in_ch = out_ch
    params["conv"] = conv_layers

    tower_layers = []
    in_dim = cfg.conv_out_dim + cfg.num_dense
    tk = jax.random.split(keys[3], len(cfg.tower_hidden) + 1)
    for li, out_dim in enumerate(cfg.tower_hidden):
        w = jax.random.normal(tk[li], (in_dim, out_dim), dtype=pdt)
        tower_layers.append(
            {"w": w * jnp.asarray(np.sqrt(2.0 / in_dim), pdt), "b": jnp.zeros((out_dim,), pdt)}
        )
        in_dim = out_dim
    w = jax.random.normal(tk[-1], (in_dim, 1), dtype=pdt)
    tower_layers.append(
        {"w": w * jnp.asarray(np.sqrt(1.0 / in_dim), pdt), "b": jnp.zeros((1,), pdt)}
    )
    params["tower"] = tower_layers
    return params


def embedding_lookup(params: Dict, ids: jax.Array, cfg: ModelConfig):
    """Replicated-table lookup. ids: (B, F) global (offset-applied) ids.

    Returns (emb_rows, lin_rows): (B, F, row_width) and (B, F, 1) | None.
    The sharded engine provides the same contract via all-to-all.
    """
    # mode="clip": ids are hashed in-range by the data layer; the default
    # "fill" mode materializes an extra full-size select pass (measured
    # 5.1 ms on the 3.3 GB row block at criteo bench shapes).
    emb_rows = jnp.take(params["embed"]["table"], ids, axis=0, mode="clip")
    lin_rows = None
    if cfg.use_first_order and not cfg.fused_linear:
        lin_rows = jnp.take(params["linear"]["table"], ids, axis=0,
                            mode="clip")
    return emb_rows, lin_rows


def wants_field_major(params: Dict, cfg: ModelConfig, interaction_fn) -> bool:
    """Whether the train step should run the FIELD-MAJOR full-rows path:
    ids transposed to (F, B) before the gather so the looked-up rows land
    (F*B, W) — the layout the fm Pallas kernel consumes directly and the
    per-field sort's order math prefers. Kills the two ~10 ms/step
    (B*F,W)<->(B,F*W) retiling copies of the batch-major full-rows path
    (traced 2026-08-20). Same gate as forward_from_rows' full-rows branch
    plus the fm kernel attribute."""
    return (getattr(interaction_fn, "full_rows_fm", None) is not None
            and cfg.fused_linear and cfg.cross == "field_aware"
            and cfg.conv_kernel % 2 == 1 and cfg.embed_dim % 2 == 0
            and bool(params["conv"]))


def embedding_lookup_fm(params: Dict, ids_fm: jax.Array, cfg: ModelConfig):
    """Field-major lookup. ids_fm: (F, B) global (offset-applied) ids.

    Returns (F, B, table_width) — physically the gather's natural
    (F*B, W) row-tile layout (the 3D view is a free bitcast when
    B % 8 == 0), so no retiling copy feeds the fm kernel."""
    return jnp.take(params["embed"]["table"], ids_fm, axis=0, mode="clip")


def onehot_lookup_fm(table_small: jax.Array, ids_fm_small: jax.Array,
                     cfg: ModelConfig, out_dtype=None) -> jax.Array:
    """One-hot MXU lookup of the small-field table prefix.

    table_small: (small_rows, table_width) — the table's leading block
    (small fields' offsets start at 0 because they are a field PREFIX).
    ids_fm_small: (small_field_prefix, B) GLOBAL ids. Returns
    (small_field_prefix, B, table_width).

    Per field: onehot (B, v_f) @ table_small[off:off+v_f] — one MXU
    matmul instead of B scattered HBM row reads (each of which drags
    its full (8,128) tile neighborhood: the measured gather floor,
    docs/PLATFORM_NOTES.md). Exactness: each output row is exactly one
    1.0 * row product (a one-hot contraction), so this is BIT-equal to
    the gather in any dtype. Differentiable w.r.t. table_small —
    autodiff of the matmul IS the dedup-summed per-row gradient, so
    the small block takes the dense per-row update
    (optim.rowwise.dense_rowwise_apply) and its ids never enter the
    sort/dedup/scatter pipeline."""
    dt = out_dtype or table_small.dtype
    outs = []
    off = 0
    for f in range(cfg.small_field_prefix):
        v = int(cfg.vocab_sizes[f])
        oh = (ids_fm_small[f][:, None]
              == (off + jnp.arange(v, dtype=ids_fm_small.dtype))[None, :]
              ).astype(dt)
        outs.append(oh @ table_small[off:off + v].astype(dt))
        off += v
    return jnp.stack(outs, axis=0)


def forward_from_rows_fm(
    params: Dict,
    emb3: jax.Array,
    dense: Optional[jax.Array],
    cfg: ModelConfig,
    *,
    interaction_fn,
) -> jax.Array:
    """Field-major twin of forward_from_rows' full-rows branch: emb3 is
    (F, B, table_width) raw physical rows; the fused kernel slices
    fields and carries the first-order column in-kernel."""
    cdt = jnp.dtype(cfg.compute_dtype)
    feats, lin_sum = interaction_fn.full_rows_fm(
        emb3.astype(cdt), params["conv"], cfg)
    if dense is not None and cfg.num_dense > 0:
        feats = jnp.concatenate([feats, dense.astype(cdt)], axis=-1)
    logits = _tower(params, feats, cfg).astype(jnp.float32)
    logits = logits + lin_sum
    logits = logits + params["linear"]["bias"].astype(jnp.float32)
    return logits


def forward_from_rows_fm2(
    params: Dict,
    emb_small: jax.Array,
    emb_big: Optional[jax.Array],
    dense: Optional[jax.Array],
    cfg: ModelConfig,
    *,
    interaction_fn,
) -> jax.Array:
    """Split-operand twin of forward_from_rows_fm for the hybrid
    small/big lookup: emb_small (Fs, B, W) from onehot_lookup_fm,
    emb_big (Fb, B, W) from the gather. Routes to the split kernel
    (interaction_fn.full_rows_fm2) when available — no HBM concat —
    and falls back to concat + the single-operand path otherwise
    (reference/jnp configurations)."""
    fn2 = getattr(interaction_fn, "full_rows_fm2", None)
    if emb_big is None:
        return forward_from_rows_fm(params, emb_small, dense, cfg,
                                    interaction_fn=interaction_fn)
    if fn2 is None:
        emb3 = jnp.concatenate([emb_small, emb_big], axis=0)
        return forward_from_rows_fm(params, emb3, dense, cfg,
                                    interaction_fn=interaction_fn)
    cdt = jnp.dtype(cfg.compute_dtype)
    feats, lin_sum = fn2(emb_small.astype(cdt), emb_big.astype(cdt),
                         params["conv"], cfg)
    if dense is not None and cfg.num_dense > 0:
        feats = jnp.concatenate([feats, dense.astype(cdt)], axis=-1)
    logits = _tower(params, feats, cfg).astype(jnp.float32)
    logits = logits + lin_sum
    logits = logits + params["linear"]["bias"].astype(jnp.float32)
    return logits


def _tower(params: Dict, x: jax.Array, cfg: ModelConfig) -> jax.Array:
    layers = params["tower"]
    for layer in layers[:-1]:
        x = x @ layer["w"].astype(x.dtype) + layer["b"].astype(x.dtype)
        x = jax.nn.relu(x)
    last = layers[-1]
    x = x @ last["w"].astype(x.dtype) + last["b"].astype(x.dtype)
    return x[:, 0]


def forward_from_rows(
    params: Dict,
    emb_rows: jax.Array,
    lin_rows: Optional[jax.Array],
    dense: Optional[jax.Array],
    cfg: ModelConfig,
    *,
    interaction_fn=None,
) -> jax.Array:
    """Forward pass from looked-up rows to logits (B,).

    interaction_fn(emb, conv_params, cfg) -> flat conv features; defaults
    to the jnp reference; the Pallas fused kernel is dropped in here.
    """
    b = emb_rows.shape[0]
    cdt = jnp.dtype(cfg.compute_dtype)

    # Full-rows fast path: hand the Pallas kernel the raw physical rows
    # (free reshape of the gather output) and let it slice fields and
    # carry the fused first-order column in-kernel — the sliced path
    # below costs ~25 ms/step of layout copies at criteo bench shapes
    # (see ops/interaction_conv.cross_conv1_lin_pallas).
    full_rows = getattr(interaction_fn, "full_rows", None)
    if (full_rows is not None and cfg.fused_linear
            and cfg.cross == "field_aware" and cfg.conv_kernel % 2 == 1
            and cfg.embed_dim % 2 == 0 and params["conv"]):
        emb2d = emb_rows.reshape(
            b, cfg.num_fields * cfg.table_width).astype(cdt)
        feats, lin_sum = full_rows(emb2d, params["conv"], cfg)
        if dense is not None and cfg.num_dense > 0:
            feats = jnp.concatenate([feats, dense.astype(cdt)], axis=-1)
        logits = _tower(params, feats, cfg).astype(jnp.float32)
        logits = logits + lin_sum
        logits = logits + params["linear"]["bias"].astype(jnp.float32)
        return logits

    emb = emb_rows.astype(cdt)
    if cfg.fused_linear:
        # first-order weights ride in the padding column (one gather)
        lin_rows = emb_rows[..., cfg.row_width : cfg.row_width + 1]
    if cfg.table_width != cfg.row_width:
        # physical rows are lane-padded; autodiff zero-pads the grads back
        emb = emb[..., : cfg.row_width]
    if cfg.cross == "field_aware":
        emb = emb.reshape(b, cfg.num_fields, cfg.num_fields, cfg.embed_dim)

    if interaction_fn is None:
        feats = conv_core_reference(build_cross_map(emb, cfg), params["conv"], cfg)
    else:
        feats = interaction_fn(emb, params["conv"], cfg)

    if dense is not None and cfg.num_dense > 0:
        feats = jnp.concatenate([feats, dense.astype(cdt)], axis=-1)

    logits = _tower(params, feats, cfg).astype(jnp.float32)

    if cfg.use_first_order:
        logits = logits + jnp.sum(lin_rows.astype(jnp.float32), axis=(1, 2))
        logits = logits + params["linear"]["bias"].astype(jnp.float32)
    return logits


def forward(
    params: Dict,
    ids: jax.Array,
    dense: Optional[jax.Array],
    cfg: ModelConfig,
    *,
    interaction_fn=None,
) -> jax.Array:
    """Full replicated-table forward: ids -> logits.

    Routes through the field-major hybrid small-field path (one-hot
    MXU lookup of the table prefix + big-field gather + split-operand
    kernel) when the config qualifies — the inference/eval twin of
    train_step's hybrid. BIT-equal to the gather (one-hot contraction
    + the proven fm==bm kernel equality); measured fwd-only 58.2 ->
    46.2 ms at criteo bench shapes (1.42M ex/s serving, 2026-08-21)."""
    fs = cfg.small_field_prefix
    if fs and wants_field_major(params, cfg, interaction_fn):
        ids_fm = ids.T
        table_small = params["embed"]["table"][: cfg.small_rows]
        cdt = jnp.dtype(cfg.compute_dtype)
        emb_small = onehot_lookup_fm(table_small, ids_fm[:fs], cfg,
                                     out_dtype=cdt)
        emb_big = (embedding_lookup_fm(params, ids_fm[fs:], cfg)
                   if fs < cfg.num_fields else None)
        return forward_from_rows_fm2(params, emb_small, emb_big, dense,
                                     cfg, interaction_fn=interaction_fn)
    emb_rows, lin_rows = embedding_lookup(params, ids, cfg)
    return forward_from_rows(
        params, emb_rows, lin_rows, dense, cfg, interaction_fn=interaction_fn
    )
