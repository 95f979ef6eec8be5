"""Hybrid small-field lookup (ModelConfig.small_field_threshold):
leading small-vocab fields go through a one-hot MXU lookup with a
dense per-row update; big fields keep the gather + sort/dedup path.
Must match the pure-gather step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu import train as train_lib
from cffm_tpu.config import DataConfig, ModelConfig, OptimizerConfig, TrainConfig
from cffm_tpu.models import cffm as model_lib
from cffm_tpu.models.cffm import field_offsets


def _cfg(threshold, vocabs, batch=512, sparse="adagrad"):
    return TrainConfig(
        name="smallfield_test",
        model=ModelConfig(
            num_fields=len(vocabs), vocab_sizes=vocabs, embed_dim=16,
            cross="field_aware", conv_channels=(16,), tower_hidden=(32,),
            compute_dtype="float32", use_pallas=False,
            small_field_threshold=threshold,
        ),
        optim=OptimizerConfig(sparse_optimizer=sparse,
                              dense_optimizer="adam"),
        data=DataConfig(batch_size=batch),
    )


MIXED = (32, 64, 128) + (1000,) * 12   # F=15 -> fused_linear (pad to 256)


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = cfg.data.batch_size
    ids_local = np.stack(
        [np.minimum(rng.zipf(1.3, size=b) - 1, v - 1)
         for v in cfg.model.vocab_sizes], axis=1).astype(np.int32)
    ids = jnp.asarray(
        ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    labels = jnp.asarray((rng.random(b) < 0.4).astype(np.float32))
    return ids, labels


def test_prefix_properties():
    m = _cfg(512, MIXED).model
    assert m.small_field_prefix == 3 and m.small_rows == 32 + 64 + 128
    assert _cfg(0, MIXED).model.small_field_prefix == 0
    # non-prefix small fields don't qualify
    m2 = _cfg(512, (1000, 32, 32)).model
    assert m2.small_field_prefix == 0
    # VMEM cap: a huge "small" prefix stops at 4096 rows
    m3 = _cfg(512, (512,) * 10).model
    assert m3.small_rows <= 4096


def test_onehot_lookup_bit_equals_gather():
    cfg = _cfg(512, MIXED).model
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(cfg.total_vocab, cfg.table_width)),
                        jnp.float32)
    fs, sr = cfg.small_field_prefix, cfg.small_rows
    b = 64
    ids = np.stack([rng.integers(0, v, size=b)
                    for v in cfg.vocab_sizes[:fs]], axis=0)
    ids = jnp.asarray(ids + field_offsets(cfg)[:fs, None].astype(np.int32))
    got = model_lib.onehot_lookup_fm(table[:sr], ids, cfg)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("sparse", ["adagrad", "sgd"])
def test_hybrid_step_matches_gather_step(sparse):
    """Full train steps: threshold=512 (hybrid engages on the fm path)
    vs threshold=0 (pure gather) — identical math, different summation
    association on the small-field grads -> f32 allclose."""
    cfg_h = _cfg(512, MIXED, sparse=sparse)
    cfg_g = _cfg(0, MIXED, sparse=sparse)
    assert cfg_h.model.fused_linear  # fm path gate
    from cffm_tpu.ops.interaction_conv import make_interaction_fn

    fn = make_interaction_fn(use_pallas=True, interpret=True)
    params = model_lib.init_params(jax.random.key(0), cfg_h.model)
    assert model_lib.wants_field_major(params, cfg_h.model, fn)

    s_h = train_lib.create_state(cfg_h, jax.random.key(0))
    s_g = jax.tree.map(jnp.copy, s_h)
    for seed in range(3):
        ids, labels = _batch(cfg_h, seed=seed)
        s_h, m_h = train_lib.train_step(s_h, ids, None, labels, cfg_h, fn)
        s_g, m_g = train_lib.train_step(s_g, ids, None, labels, cfg_g, fn)
        np.testing.assert_allclose(float(m_h["loss"]), float(m_g["loss"]),
                                   rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_h.params["embed"]["table"]),
        np.asarray(s_g.params["embed"]["table"]), rtol=1e-5, atol=1e-6)
    if sparse == "adagrad":
        np.testing.assert_allclose(
            np.asarray(s_h.sparse_opt_state["embed"]["accum"]),
            np.asarray(s_g.sparse_opt_state["embed"]["accum"]),
            rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_h.params["tower"][0]["w"]),
        np.asarray(s_g.params["tower"][0]["w"]), rtol=1e-5, atol=1e-7)


def test_all_small_fields_step():
    """fs == F: no gather, no sparse pipeline at all — pure dense
    per-row update; must stay finite and learn."""
    vocabs = (32, 64, 128, 96, 256, 48, 64, 80, 120, 200, 500, 100,
              64, 32, 40)  # 15 fields, all <= 512, 1816 rows
    cfg = _cfg(512, vocabs)
    assert cfg.model.small_field_prefix == cfg.model.num_fields
    from cffm_tpu.ops.interaction_conv import make_interaction_fn

    fn = make_interaction_fn(use_pallas=True, interpret=True)
    state = train_lib.create_state(cfg, jax.random.key(2))
    losses = []
    for seed in range(6):
        ids, labels = _batch(cfg, seed=seed % 2)
        state, m = train_lib.train_step(state, ids, None, labels, cfg, fn)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def _shard_cfg(threshold, sparse="adagrad"):
    import dataclasses as _dc

    from cffm_tpu.config import ShardingConfig

    cfg = _cfg(threshold, MIXED, batch=512, sparse=sparse)
    return _dc.replace(
        cfg, sharding=ShardingConfig(table_sharded=True))


def test_sharded_hybrid_matches_sharded_gather(eight_devices):
    """The SHARDED twin (parallel/sharded_train._local_step): small
    block reassembled per shard via all_gather, one-hot lookup, psum'd
    dense grad applied shard-locally — must match the pure-routed
    sharded step (f32 allclose; sum association differs)."""
    from cffm_tpu.ops.interaction_conv import make_interaction_fn
    from cffm_tpu.parallel.mesh import make_mesh
    from cffm_tpu.parallel.sharded_train import (create_sharded_state,
                                                 make_sharded_train_step)

    fn = make_interaction_fn(use_pallas=True, interpret=True)
    cfg_h, cfg_g = _shard_cfg(512), _shard_cfg(0)
    mesh = make_mesh(8)
    s_h = create_sharded_state(cfg_h, jax.random.key(4), mesh)
    s_g = jax.tree.map(jnp.copy, s_h)
    step_h = make_sharded_train_step(cfg_h, mesh, fn)
    step_g = make_sharded_train_step(cfg_g, mesh, fn)
    for seed in range(3):
        ids, labels = _batch(cfg_h, seed=seed)
        s_h, m_h = step_h(s_h, ids, None, labels)
        s_g, m_g = step_g(s_g, ids, None, labels)
        assert int(m_h["overflow"]) == 0
        np.testing.assert_allclose(float(m_h["loss"]), float(m_g["loss"]),
                                   rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_h.params["embed"]["table"]),
        np.asarray(s_g.params["embed"]["table"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_h.sparse_opt_state["embed"]["accum"]),
        np.asarray(s_g.sparse_opt_state["embed"]["accum"]),
        rtol=1e-5, atol=1e-6)


def test_hier_hybrid_step_runs(eight_devices):
    """Hybrid + hierarchical exchange on the 2x4 mesh: the all_gather
    rides both axes; step must stay finite and learn."""
    import dataclasses as _dc

    from jax.sharding import PartitionSpec as P

    from cffm_tpu.ops.interaction_conv import make_interaction_fn
    from cffm_tpu.parallel.dcn_mesh import make_mesh_2d
    from cffm_tpu.parallel.sharded_train import (
        create_sharded_state, make_sharded_train_step_hier)

    fn = make_interaction_fn(use_pallas=True, interpret=True)
    cfg = _dc.replace(
        _shard_cfg(512),
        sharding=_dc.replace(_shard_cfg(512).sharding, table_axis="hier"))
    mesh2d = make_mesh_2d(2, 4)
    state = create_sharded_state(cfg, jax.random.key(5), mesh2d,
                                 table_pspec=P(("host", "chip"), None))
    step = make_sharded_train_step_hier(cfg, mesh2d, fn)
    losses = []
    for seed in range(5):
        ids, labels = _batch(cfg, seed=seed % 2)
        state, m = step(state, ids, None, labels)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_forward_scoring_hybrid_bit_equals_gather():
    """The inference/eval twin (models.forward): hybrid routing must
    produce BIT-identical logits to the pure-gather forward (one-hot
    contraction exactness + the proven fm==bm kernel bit-equality)."""
    from cffm_tpu.ops.interaction_conv import make_interaction_fn

    cfg_h = _cfg(512, MIXED).model
    cfg_g = _cfg(0, MIXED).model
    assert cfg_h.small_field_prefix > 0 and cfg_g.small_field_prefix == 0
    fn = make_interaction_fn(use_pallas=True, interpret=True)
    params = model_lib.init_params(jax.random.key(3), cfg_h)
    ids, _ = _batch(_cfg(512, MIXED, batch=64))
    got = model_lib.forward(params, ids, None, cfg_h, interaction_fn=fn)
    want = model_lib.forward(params, ids, None, cfg_g, interaction_fn=fn)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_adam_falls_back_to_gather():
    """Dense-form updates exist for adagrad/sgd only; adam configs must
    keep the pure-gather path (and still run)."""
    cfg = _cfg(512, MIXED, sparse="adam")
    from cffm_tpu.ops.interaction_conv import make_interaction_fn

    fn = make_interaction_fn(use_pallas=True, interpret=True)
    state = train_lib.create_state(cfg, jax.random.key(1))
    ids, labels = _batch(cfg)
    state, m = train_lib.train_step(state, ids, None, labels, cfg, fn)
    assert np.isfinite(float(m["loss"]))