"""SPMD train/eval steps: row-sharded tables + data-parallel dense.

The whole step runs inside one `shard_map` over the flat "data" axis
(SURVEY.md §4.1 call stack): routed dedup lookup (all-to-all x2),
model forward/backward on the local batch shard, pmean of dense grads,
reverse all-to-all of row grads, and the colocated per-row sparse
update — the five collective crossings of the survey's hot path.

Dense params and optimizer state are replicated (P()); tables, their
per-row optimizer state, and the batch ride P("data"). The dense optax
update runs identically on every shard (inputs are pmean'd), keeping
replicas bit-identical without a broadcast.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cffm_tpu import metrics
from cffm_tpu.config import TrainConfig
from cffm_tpu.models import cffm as model_lib
from cffm_tpu.optim.rowwise import (bucketed_rowwise_update,
                                    make_dense_optimizer, rowwise_init,
                                    scale_updates, schedule_factor, sr_keys,
                                    unique_bound)
from cffm_tpu.parallel import sharded_embedding as se
from cffm_tpu.train import TrainState, merge_dense_params, split_dense_params

AXIS = "data"
from cffm_tpu.parallel.dcn_mesh import CHIP, HOST  # 2D-mesh axis names


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FlatRouter:
    """Exchange strategy: one all-to-all over the flat device axis
    (sharded_embedding). The default; optimal inside one ICI domain.

    Capacities are frozen at construction (they size the static
    exchange buffers), but the distinct-id bound and the overflow-mask
    elision are derived from the TRACED id shapes in build() — a step
    retraced at a different batch than cfg.data.batch_size degrades to
    masked+counted overflow instead of silently gathering garbage."""

    def __init__(self, axis: str, capacity: int, rows_per_shard: int,
                 vocab_sizes, num_fields: int, num_shards: int):
        self.axis = axis
        self.axes = (axis,)          # psum axes for loss/dense grads
        self.capacity = capacity
        self.rows_per_shard = rows_per_shard
        self.vocab_sizes = vocab_sizes
        self.num_fields = num_fields
        self.num_shards = num_shards
        self.batch_unique = None     # set per trace in build()
        self.no_ovf = False

    def build(self, flat_ids, vocab_sizes=None):
        # vocab_sizes: the per-field vocabs the ids actually cover —
        # the hybrid small-field path routes only the big-field subset
        vocabs = self.vocab_sizes if vocab_sizes is None else vocab_sizes
        n = flat_ids.shape[0]
        self.batch_unique = unique_bound(vocabs, n // len(vocabs))
        # capacity statically covers the bound -> overflow impossible ->
        # the lookups skip their full-width overflow masks
        self.no_ovf = self.capacity >= min(n, self.batch_unique)
        return se.build_routing(flat_ids, self.capacity, self.axis,
                                rows_per_shard=self.rows_per_shard,
                                max_unique=self.batch_unique)

    def lookup(self, table_local, routing, out_dtype):
        return se.routed_lookup(table_local, routing, self.axis,
                                out_dtype=out_dtype,
                                assume_no_overflow=self.no_ovf)

    def grad(self, drows_flat, routing):
        return se.grad_return(drows_flat, routing, self.axis,
                              max_unique=self.batch_unique)

    def overflow(self, routing):
        return routing.overflow

    def shard_index(self):
        return jax.lax.axis_index(self.axis)


class HierRouter:
    """Exchange strategy: two-stage hierarchical exchange over a
    ("host", "chip") mesh with HOST-LEVEL dedup (hier_embedding) —
    each host-distinct row crosses DCN once per direction. Same table
    layout as FlatRouter (mod-sharding over the flattened axis).
    Same guard contract as FlatRouter: capacities static, bounds and
    mask elision per traced shape."""

    def __init__(self, cap1: int, cap2: int, rows_per_shard: int,
                 vocab_sizes, num_fields: int,
                 num_hosts: int, chips_per_host: int,
                 host_axis: str = HOST, chip_axis: str = CHIP):
        from cffm_tpu.parallel import hier_embedding as he
        self._he = he
        self.host_axis, self.chip_axis = host_axis, chip_axis
        self.axes = (host_axis, chip_axis)
        self.cap1, self.cap2 = cap1, cap2
        self.rows_per_shard = rows_per_shard
        self.vocab_sizes = vocab_sizes
        self.num_fields = num_fields
        self.num_shards = num_hosts * chips_per_host
        self.chips_per_host = chips_per_host
        self.batch_unique = None
        self.host_unique = None
        self.no_ovf = (False, False)

    def build(self, flat_ids, vocab_sizes=None):
        vocabs = self.vocab_sizes if vocab_sizes is None else vocab_sizes
        n = flat_ids.shape[0]
        b_loc = n // len(vocabs)
        self.batch_unique = unique_bound(vocabs, b_loc)
        self.host_unique = unique_bound(vocabs,
                                        b_loc * self.chips_per_host)
        self.no_ovf = (
            self.cap1 >= min(n, self.batch_unique),
            self.cap2 >= min(self.chips_per_host * self.cap1,
                             self.host_unique))
        return self._he.build_routing_hier(
            flat_ids, self.cap1, self.cap2, self.host_axis, self.chip_axis,
            self.rows_per_shard, max_unique1=self.batch_unique,
            max_unique2=self.host_unique)

    def lookup(self, table_local, routing, out_dtype):
        return self._he.hier_routed_lookup(
            table_local, routing, self.host_axis, self.chip_axis,
            out_dtype=out_dtype, assume_no_overflow=self.no_ovf)

    def grad(self, drows_flat, routing):
        return self._he.hier_grad_return(
            drows_flat, routing, self.host_axis, self.chip_axis,
            max_unique1=self.batch_unique, max_unique2=self.host_unique)

    def overflow(self, routing):
        return self._he.hier_overflow(routing)

    def shard_index(self):
        return (jax.lax.axis_index(self.host_axis) * self.chips_per_host
                + jax.lax.axis_index(self.chip_axis))


def create_sharded_state(cfg: TrainConfig, rng: jax.Array, mesh: Mesh,
                         table_pspec: P | None = None) -> TrainState:
    """Init with tables/opt-state row-sharded, dense replicated.

    Table storage uses the mod-sharding permutation (see
    sharded_embedding.py): vocab padded to a multiple of the shard
    count; logical id g lives at storage row (g % T) * Vs + g // T.
    Init is i.i.d. so the permutation does not change the distribution.

    table_pspec: PartitionSpec for the table's row axis; defaults to
    P(AXIS, None) on the flat mesh — the hierarchical layout passes
    P((HOST, CHIP), None), which flattens to the SAME per-device
    storage (flat shard s = host*C + chip), so flat and hier programs
    are checkpoint-interchangeable.
    """
    t = mesh.devices.size
    mcfg = cfg.model
    v_pad = _round_up(mcfg.total_vocab, t)
    sh_spec = P(AXIS, None) if table_pspec is None else table_pspec

    params = model_lib.init_params(rng, mcfg, skip_tables=True)
    # tables are created here directly at padded size
    k1, k2 = jax.random.split(rng)
    tdt = jnp.dtype(mcfg.table_dtype)
    table = (0.01 * jax.random.normal(k1, (v_pad, mcfg.table_width),
                                      dtype=jnp.float32)).astype(tdt)
    params["embed"]["table"] = jax.device_put(
        table, NamedSharding(mesh, sh_spec))
    if mcfg.use_first_order and not mcfg.fused_linear:
        lin = (0.01 * jax.random.normal(k2, (v_pad, 1),
                                        dtype=jnp.float32)).astype(tdt)
        params["linear"]["table"] = jax.device_put(
            lin, NamedSharding(mesh, sh_spec))

    repl = NamedSharding(mesh, P())
    params["conv"] = jax.device_put(params["conv"], repl)
    params["tower"] = jax.device_put(params["tower"], repl)
    if mcfg.use_first_order:
        params["linear"]["bias"] = jax.device_put(params["linear"]["bias"], repl)

    tx = make_dense_optimizer(cfg.optim)
    dense_opt_state = jax.device_put(tx.init(split_dense_params(params)), repl)

    sharded = NamedSharding(mesh, sh_spec)
    sparse = {"embed": jax.tree.map(
        lambda x: jax.device_put(x, sharded) if x.ndim == 2 else jax.device_put(x, repl),
        rowwise_init(params["embed"]["table"], cfg.optim))}
    if mcfg.use_first_order and not mcfg.fused_linear:
        sparse["linear"] = jax.tree.map(
            lambda x: jax.device_put(x, sharded) if x.ndim == 2 else jax.device_put(x, repl),
            rowwise_init(params["linear"]["table"], cfg.optim))

    # step counter replicated ON THE MESH: a bare jnp.zeros(()) carries
    # an empty sharding, while the step output's counter (computed under
    # jit with the mesh in scope) carries an Auto mesh sharding — the
    # aval mismatch made call #1 retrace+recompile the entire program
    # (~95s at criteo shapes, measured round 3: the whole "sharded path
    # is 54x slower" mystery was this one recompile amortized over a
    # 10-step bench loop).
    step0 = jax.device_put(jnp.zeros((), jnp.int32), repl)
    return TrainState(step0, params, dense_opt_state, sparse)


def _local_step(params, dense_opt_state, sparse_opt_state, step_no,
                ids, dense, labels,
                *, cfg: TrainConfig, router, interaction_fn):
    """Per-shard body (runs under shard_map). The exchange strategy is
    pluggable: FlatRouter (one all-to-all over the flat axis) or
    HierRouter (two-stage host-level-dedup exchange over a
    ("host","chip") mesh) — same table layout, same step math."""
    mcfg = cfg.model
    b_loc, f = ids.shape
    w = mcfg.table_width
    cdt = jnp.dtype(mcfg.compute_dtype)
    axes = router.axes

    table_local = params["embed"]["table"]   # (Vs, W) local shard
    # Field-major flagship path: routing/grad_return track positions
    # abstractly, so transposing the flat id order swaps the recovered
    # rows (and returned grads) into the layout the fm kernel consumes
    # with zero retiling copies (see models.cffm.wants_field_major).
    fm = model_lib.wants_field_major(params, mcfg, interaction_fn)
    # Hybrid small-field path (sharded twin of train.py's): the <=1 MB
    # small-field table prefix is REASSEMBLED on every shard each step
    # (one tiny all_gather over the mesh), looked up by one-hot MXU
    # matmuls, and its psum'd dense gradient applied shard-locally to
    # the shard's own rows — small-field ids never enter the routing,
    # cutting the exchange payload and dedup stream by their share.
    fs = (mcfg.small_field_prefix
          if fm and cfg.optim.sparse_optimizer in ("adagrad", "sgd") else 0)
    t_all = router.num_shards
    if fs:
        ids_fm = ids.T
        flat_ids = ids_fm[fs:].reshape(-1)
        route_vocabs = mcfg.vocab_sizes[fs:]
        srows = mcfg.small_rows
        ls = -(-srows // t_all)  # uniform padded local small-rows slice
    else:
        flat_ids = ids.T.reshape(-1) if fm else ids.reshape(-1)
        route_vocabs = None

    from cffm_tpu.utils.debugging import collective_probe

    def dbg(tag):
        # flattened shard index: on the hier mesh a host-only index
        # would make all chips of a host print identically
        collective_probe(tag, router.shard_index(), cfg.debug_barriers)

    dbg("routing-a2a:enter")
    routing = router.build(flat_ids, vocab_sizes=route_vocabs)
    dbg("lookup-a2a:enter")
    rows = router.lookup(table_local, routing, cdt)
    dbg("lookup-a2a:exit")
    separate_linear = mcfg.use_first_order and not mcfg.fused_linear
    lin_rows = None
    if fs:
        emb_big = rows.reshape(f - fs, b_loc, w)
        # reassemble the natural-order small block from the mod-sharded
        # storage: shard s's local row l holds global id l*T + s
        gathered = jax.lax.all_gather(table_local[:ls], router.axes,
                                      axis=0, tiled=True)  # (T*ls, W)
        gidx = ((jnp.arange(srows, dtype=jnp.int32) % t_all) * ls
                + jnp.arange(srows, dtype=jnp.int32) // t_all)
        table_small = jnp.take(gathered, gidx, axis=0)     # (srows, W)
    else:
        emb_rows = (rows.reshape(f, b_loc, w) if fm
                    else rows.reshape(b_loc, f, w))
        if separate_linear:
            lin_rows = router.lookup(params["linear"]["table"], routing,
                                     jnp.float32).reshape(b_loc, f, 1)

    def loss_fn(dense_params, emb_rows, lin_rows):
        full = merge_dense_params(params, dense_params)
        if fm:
            logits = model_lib.forward_from_rows_fm(
                full, emb_rows, dense, mcfg, interaction_fn=interaction_fn)
        else:
            logits = model_lib.forward_from_rows(
                full, emb_rows, lin_rows, dense, mcfg,
                interaction_fn=interaction_fn)
        # global mean logloss: local sum / global batch
        local_sum = jnp.sum(metrics.sigmoid_bce_with_logits(logits, labels))
        global_b = b_loc * router.num_shards
        return local_sum / global_b, logits

    def loss_fn_hybrid(dense_params, table_small, emb_big):
        full = merge_dense_params(params, dense_params)
        emb3_small = model_lib.onehot_lookup_fm(table_small, ids_fm[:fs],
                                                mcfg, out_dtype=cdt)
        logits = model_lib.forward_from_rows_fm2(
            full, emb3_small, emb_big, dense, mcfg,
            interaction_fn=interaction_fn)
        local_sum = jnp.sum(metrics.sigmoid_bce_with_logits(logits, labels))
        return local_sum / (b_loc * router.num_shards), logits

    dtab_small = None
    if fs:
        (loss, logits), (dgrads, dtab_small, demb) = jax.value_and_grad(
            loss_fn_hybrid, argnums=(0, 1, 2), has_aux=True)(
            split_dense_params(params), table_small, emb_big)
        dlin = None
        # every shard sees the global small-block gradient
        dtab_small = jax.lax.psum(dtab_small.astype(jnp.float32),
                                  router.axes)
    else:
        argnums = (0, 1, 2) if separate_linear else (0, 1)
        grad_fn = jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)
        if separate_linear:
            (loss, logits), (dgrads, demb, dlin) = grad_fn(
                split_dense_params(params), emb_rows, lin_rows)
        else:
            (loss, logits), (dgrads, demb) = grad_fn(
                split_dense_params(params), emb_rows, None)
            dlin = None
    dbg("loss-psum:enter")
    loss = jax.lax.psum(loss, axes)

    # dense params: psum grads (loss already divided by global batch)
    dbg("grads-psum:enter")
    dgrads = jax.lax.psum(dgrads, axes)
    dbg("grads-psum:exit")
    lrf = schedule_factor(cfg.optim, step_no, cfg.data.num_train_steps)
    tx = make_dense_optimizer(cfg.optim)
    updates, new_dense_opt = tx.update(dgrads, dense_opt_state,
                                       split_dense_params(params))
    new_dense = optax.apply_updates(split_dense_params(params),
                                    scale_updates(updates, lrf))
    new_params = merge_dense_params(params, new_dense)

    # sparse: reverse all-to-all(s), per-row update local to the shard.
    # router.grad hands back the per-peer buckets (T, C) / (T, C, W);
    # the bucketed update consumes them directly — no re-sort/re-dedup
    # (cross-peer duplicate rows are summed inside the apply kernel).
    dbg("grad-return-a2a:enter")
    row_ids, row_grads = router.grad(demb.reshape(-1, w), routing)
    dbg("grad-return-a2a:exit")
    new_sparse = dict(sparse_opt_state)
    sk_emb, sk_lin = sr_keys(mcfg.table_dtype, cfg.optim, step_no,
                             cfg.data.seed)
    if sk_emb is not None:
        # decorrelate the shards' stochastic-rounding dither
        sk_emb = jax.random.fold_in(sk_emb, router.shard_index())
        sk_lin = jax.random.fold_in(sk_lin, router.shard_index())
    new_table, new_sparse["embed"] = bucketed_rowwise_update(
        table_local, sparse_opt_state["embed"], row_ids, row_grads, cfg.optim,
        lr_scale=lrf, sr_key=sk_emb)
    if fs:
        # small block: each shard applies the psum'd dense gradient to
        # its OWN rows of the prefix (local row l holds global id
        # l*T + shard; rows past srows on the padded slice get a
        # masked zero grad -> exact no-op). Disjoint from every big id
        # (those map to local rows >= the prefix slice or > srows).
        from cffm_tpu.optim.rowwise import dense_rowwise_apply

        lidx = (jnp.arange(ls, dtype=jnp.int32) * t_all
                + router.shard_index())
        g_small = jnp.where(
            (lidx < srows)[:, None],
            jnp.take(dtab_small, jnp.minimum(lidx, srows - 1), axis=0),
            0.0)
        small_state = {
            k2: (v2[:ls] if getattr(v2, "ndim", 0) >= 1
                 and v2.shape[0] == new_table.shape[0] else v2)
            for k2, v2 in new_sparse["embed"].items()}
        sk_small = None if sk_emb is None else jax.random.fold_in(sk_emb, 1)
        new_small, new_small_state = dense_rowwise_apply(
            new_table[:ls], small_state, g_small, cfg.optim,
            lr_scale=lrf, sr_key=sk_small)
        new_table = new_table.at[:ls].set(new_small)
        for k2, v2 in new_small_state.items():
            fullv = new_sparse["embed"][k2]
            if (getattr(v2, "ndim", 0) >= 1
                    and fullv.shape[0] == new_table.shape[0]):
                new_sparse["embed"][k2] = fullv.at[:ls].set(v2)
    new_params = dict(new_params, embed={"table": new_table})
    if separate_linear:
        lrow_ids, lrow_grads = router.grad(
            dlin.reshape(-1, 1).astype(jnp.float32), routing)
        new_lin, new_sparse["linear"] = bucketed_rowwise_update(
            params["linear"]["table"], sparse_opt_state["linear"],
            lrow_ids, lrow_grads, cfg.optim, lr_scale=lrf, sr_key=sk_lin)
        new_params = dict(new_params, linear=dict(new_params["linear"], table=new_lin))

    step_metrics = {
        "loss": loss,
        "overflow": jax.lax.psum(router.overflow(routing), axes),
    }
    return new_params, new_dense_opt, new_sparse, step_metrics


def _make_flat_router(cfg: TrainConfig, t: int) -> FlatRouter:
    b_glob = cfg.data.batch_size
    n_local = (b_glob // t) * cfg.model.num_fields
    v_pad = _round_up(cfg.model.total_vocab, t)
    batch_unique = unique_bound(cfg.model.vocab_sizes, b_glob // t)
    capacity = se.pick_capacity(n_local, t, cfg.sharding.id_capacity_factor,
                                rows_per_shard=v_pad // t,
                                max_unique=batch_unique,
                                cap_rows=cfg.sharding.cap_rows)
    return FlatRouter(AXIS, capacity, v_pad // t, cfg.model.vocab_sizes,
                      cfg.model.num_fields, t)


def _make_hier_router(cfg: TrainConfig, mesh: Mesh) -> "HierRouter":
    from cffm_tpu.parallel import hier_embedding as he

    h, c = mesh.shape[HOST], mesh.shape[CHIP]
    t = h * c
    b_glob = cfg.data.batch_size
    b_loc = b_glob // t
    n_local = b_loc * cfg.model.num_fields
    v_pad = _round_up(cfg.model.total_vocab, t)
    batch_unique = unique_bound(cfg.model.vocab_sizes, b_loc)
    host_unique = unique_bound(cfg.model.vocab_sizes, b_loc * c)
    cap1, cap2 = he.pick_capacities_hier(
        n_local, h, c, cfg.sharding.id_capacity_factor, v_pad // t,
        batch_unique, host_unique, cap_rows=cfg.sharding.cap_rows,
        cap_rows_host=cfg.sharding.cap_rows_host)
    return HierRouter(cap1, cap2, v_pad // t, cfg.model.vocab_sizes,
                      cfg.model.num_fields, h, c)


def _param_specs(cfg: TrainConfig, sh_table: P):
    repl = P()
    params_spec = {
        "embed": {"table": sh_table},
        "conv": repl, "tower": repl,
    }
    if cfg.model.use_first_order:
        params_spec["linear"] = (
            {"bias": repl} if cfg.model.fused_linear
            else {"table": sh_table, "bias": repl})
    return params_spec


def _make_train_step(cfg: TrainConfig, mesh: Mesh, interaction_fn, router,
                     sh_table: P, batch: P):
    body = functools.partial(_local_step, cfg=cfg, router=router,
                             interaction_fn=interaction_fn)
    repl = P()
    params_spec = _param_specs(cfg, sh_table)

    def make_sparse_spec(state):
        return jax.tree.map(lambda x: sh_table if x.ndim == 2 else repl, state)

    def step(state: TrainState, ids, dense, labels):
        sparse_specs = make_sparse_spec(state.sparse_opt_state)
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(params_spec, repl, sparse_specs, repl,
                      batch, repl if dense is None else batch, batch),
            out_specs=(params_spec, repl, sparse_specs, repl),
            check_vma=False,
        )
        new_params, new_dense_opt, new_sparse, m = fn(
            state.params, state.dense_opt_state, state.sparse_opt_state,
            state.step, ids, dense, labels)
        return TrainState(state.step + 1, new_params, new_dense_opt,
                          new_sparse), m

    return jax.jit(step, donate_argnums=(0,))


def make_sharded_train_step(cfg: TrainConfig, mesh: Mesh, interaction_fn=None):
    router = _make_flat_router(cfg, mesh.devices.size)
    return _make_train_step(cfg, mesh, interaction_fn, router,
                            sh_table=P(AXIS, None), batch=P(AXIS))


def make_sharded_train_step_hier(cfg: TrainConfig, mesh: Mesh,
                                 interaction_fn=None):
    """Train step over a ("host", "chip") mesh with the HIERARCHICAL
    host-level-dedup exchange (parallel/hier_embedding.py). The table
    layout is the flat mod-sharding over the flattened axis — same
    storage as make_sharded_train_step on the equivalent flat mesh —
    but each host-distinct row crosses the host boundary (DCN) once
    per direction instead of once per requesting chip."""
    router = _make_hier_router(cfg, mesh)
    both = (HOST, CHIP)
    return _make_train_step(cfg, mesh, interaction_fn, router,
                            sh_table=P(both, None), batch=P(both))


def wrap_wire_step(step, wire_spec, mcfg):
    """Jitted (state, wire_dict) variant of a raw sharded (state, ids,
    dense, labels) step: unpack the packed wire batch (data/wire.py) and
    apply field offsets ON DEVICE. The unpack is elementwise along the
    batch axis, so P("data")-sharded wire arrays stay sharded and no
    resharding happens before the shard_map. Shared by the flat and 2D
    (DCN) sharded paths — this closes round 2's raw-downgrade gap where
    the path that needs H2D bandwidth most shipped 2.2x the bytes."""
    from cffm_tpu.data import wire as wire_lib
    from cffm_tpu.models.cffm import field_offsets

    offs = jnp.asarray(field_offsets(mcfg), jnp.int32)[None, :]

    def wire_step(state: TrainState, wire: dict):
        ids_local, dense, labels = wire_lib.unpack(wire, wire_spec)
        return step(state, ids_local + offs, dense, labels)

    return jax.jit(wire_step, donate_argnums=(0,))


def _eval_body(params, auc_state, ids, dense, labels, mask,
               *, cfg: TrainConfig, router, interaction_fn):
    mcfg = cfg.model
    b_loc, f = ids.shape
    cdt = jnp.dtype(mcfg.compute_dtype)
    routing = router.build(ids.reshape(-1))
    emb_rows = router.lookup(params["embed"]["table"], routing, cdt
                             ).reshape(b_loc, f, mcfg.table_width)
    lin_rows = None
    if mcfg.use_first_order and not mcfg.fused_linear:
        lin_rows = router.lookup(params["linear"]["table"], routing,
                                 jnp.float32).reshape(b_loc, f, 1)
    logits = model_lib.forward_from_rows(
        params, emb_rows, lin_rows, dense, mcfg, interaction_fn=interaction_fn)
    logits = logits + metrics.calibration_offset(cfg.data)
    # each shard updates its local accumulator; merged via psum
    upd = metrics.auc_state_update(
        jax.tree.map(jnp.zeros_like, auc_state), logits, labels,
        mask=mask)
    return jax.tree.map(lambda a, u: a + jax.lax.psum(u, router.axes),
                        auc_state, upd)


def _make_eval_step(cfg: TrainConfig, mesh: Mesh, interaction_fn, router,
                    sh_table: P, batch: P):
    repl = P()
    body = functools.partial(_eval_body, cfg=cfg, router=router,
                             interaction_fn=interaction_fn)
    params_spec = _param_specs(cfg, sh_table)

    def step(state: TrainState, auc_state, ids, dense, labels, mask=None):
        # mask: 0/1 weights for full-pass eval tail padding (train.py)
        if mask is None:
            mask = jnp.ones_like(labels)
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(params_spec, repl, batch,
                      repl if dense is None else batch, batch, batch),
            out_specs=repl,
            check_vma=False,
        )
        return fn(state.params, auc_state, ids, dense, labels, mask)

    return jax.jit(step)


def make_sharded_eval_step(cfg: TrainConfig, mesh: Mesh, interaction_fn=None):
    router = _make_flat_router(cfg, mesh.devices.size)
    return _make_eval_step(cfg, mesh, interaction_fn, router,
                           sh_table=P(AXIS, None), batch=P(AXIS))


def make_sharded_eval_step_hier(cfg: TrainConfig, mesh: Mesh,
                                interaction_fn=None):
    router = _make_hier_router(cfg, mesh)
    both = (HOST, CHIP)
    return _make_eval_step(cfg, mesh, interaction_fn, router,
                           sh_table=P(both, None), batch=P(both))
