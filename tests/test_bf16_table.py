"""bf16 embedding-table storage + stochastic rounding (ops/rounding.py).

Covers: the rounding primitive (exactness, unbiasedness), the
gather-modify-write sparse update into a bf16 table (untouched rows
bit-exact, touched rows within one ulp of the f32 math), the sub-ulp
accumulation property that motivates stochastic over nearest rounding,
and an end-to-end learn check with table_dtype=bfloat16.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu.config import OptimizerConfig, get_config
from cffm_tpu.ops.rounding import stochastic_round_bf16
from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update

V, W = 256, 16


def test_sr_exact_values_pass_through():
    # bf16-representable values must round to themselves for ANY key.
    x = jnp.asarray([0.0, 1.0, -2.5, 384.0, 1e-8, -0.15625], jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)  # snap to bf16 grid
    for s in range(5):
        out = stochastic_round_bf16(x, jax.random.key(s))
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(x, np.float32))


def test_sr_unbiased_and_two_neighbor():
    # A value strictly between bf16 neighbors lo < x < hi must round to
    # one of the two, with E[round(x)] -> x.
    hi = 1.0 + 2.0 ** -7  # the next bf16 after 1.0 (7 mantissa bits)
    x = jnp.full((4096,), 1.0 + 0.25 * (hi - 1.0), jnp.float32)
    out = stochastic_round_bf16(x, jax.random.key(7)).astype(jnp.float32)
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({1.0, float(hi)}), vals
    # P(hi) = 0.25 => mean within a few std errors (sigma ~ 0.43/64)
    frac_hi = float(np.mean(np.asarray(out) == float(hi)))
    assert abs(frac_hi - 0.25) < 0.05, frac_hi


def test_sr_nan_inf_passthrough():
    x = jnp.asarray([np.inf, -np.inf, np.nan, 1.0], jnp.float32)
    out = np.asarray(stochastic_round_bf16(x, jax.random.key(0)), np.float32)
    assert np.isposinf(out[0]) and np.isneginf(out[1]) and np.isnan(out[2])


def test_bf16_adagrad_untouched_rows_bit_exact():
    rng = np.random.default_rng(3)
    opt = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.1)
    table = jnp.asarray(rng.normal(size=(V, W)), jnp.float32).astype(jnp.bfloat16)
    ids = rng.integers(1, V // 2, size=64).astype(np.int32)
    ids[::7] = -1  # sentinels
    grads = jnp.asarray(rng.normal(size=(64, W)), jnp.float32)

    state = rowwise_init(table, opt)
    new_table, new_state = rowwise_update(
        table, state, jnp.asarray(ids), grads, opt,
        sr_key=jax.random.key(11))
    assert new_table.dtype == jnp.bfloat16
    touched = np.zeros(V, bool)
    touched[ids[ids >= 0]] = True
    old = np.asarray(table, np.float32)
    new = np.asarray(new_table, np.float32)
    np.testing.assert_array_equal(new[~touched], old[~touched])
    # untouched rows keep their accumulator exactly
    acc = np.asarray(new_state["accum"])
    assert np.all(acc[~touched, 0] == float(opt.adagrad_init))

    # touched rows: within one bf16 ulp of the f32-math result
    f32_table, _ = rowwise_update(
        table.astype(jnp.float32), rowwise_init(table.astype(jnp.float32), opt),
        jnp.asarray(ids), grads, opt)
    want = np.asarray(f32_table, np.float32)[touched]
    got = new[touched]
    ulp = np.maximum(np.abs(want) * 2.0 ** -7, 2.0 ** -133)
    assert np.all(np.abs(got - want) <= ulp + 1e-7)


def test_sr_accumulates_sub_ulp_updates_nearest_stalls():
    # 512 SGD steps of delta = 1/4096 on a weight of 1.0 (bf16 ulp
    # 1/256): nearest rounding drops every step; stochastic accumulates
    # the expected 0.125 drift. THE reason stochastic is the default.
    opt_sr = OptimizerConfig(sparse_optimizer="sgd", sparse_lr=1.0,
                             table_rounding="stochastic")
    opt_rn = dataclasses.replace(opt_sr, table_rounding="nearest")
    table = jnp.ones((4, 8), jnp.bfloat16)
    ids = jnp.zeros((1,), jnp.int32)
    g = jnp.full((1, 8), -1.0 / 4096.0, jnp.float32)  # delta = +1/4096

    t_sr, t_rn = table, table
    for s in range(512):
        t_sr, _ = rowwise_update(t_sr, {}, ids, g, opt_sr,
                                 sr_key=jax.random.key(s))
        t_rn, _ = rowwise_update(t_rn, {}, ids, g, opt_rn)
    drift_sr = float(np.mean(np.asarray(t_sr, np.float32)[0])) - 1.0
    drift_rn = float(np.mean(np.asarray(t_rn, np.float32)[0])) - 1.0
    assert drift_rn == 0.0, drift_rn  # nearest: all 512 updates lost
    assert 0.0625 < drift_sr < 0.1875, drift_sr  # expect ~0.125


def test_bf16_table_end_to_end_learns():
    from cffm_tpu import train as train_lib

    cfg = get_config("movielens")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, table_dtype="bfloat16",
                                  use_pallas=False),
        data=dataclasses.replace(cfg.data, dataset="synthetic",
                                 batch_size=512, num_train_steps=300,
                                 eval_batches=8),
        log_every=1000,
    )
    out = train_lib.run(cfg)
    assert out["auc"] > 0.55, out
    assert np.isfinite(out["logloss"])


def test_bf16_table_sharded_step_runs(eight_devices):
    import jax.sharding as jsh

    from cffm_tpu.parallel.mesh import make_mesh
    from cffm_tpu.parallel.sharded_train import (create_sharded_state,
                                                 make_sharded_train_step)

    cfg = get_config("movielens")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, table_dtype="bfloat16",
                                  use_pallas=False),
        data=dataclasses.replace(cfg.data, batch_size=256),
        sharding=dataclasses.replace(cfg.sharding, table_sharded=True),
    )
    mesh = make_mesh()
    state = create_sharded_state(cfg, jax.random.key(0), mesh)
    assert state.params["embed"]["table"].dtype == jnp.bfloat16
    step = make_sharded_train_step(cfg, mesh)

    rng = np.random.default_rng(0)
    from cffm_tpu.models.cffm import field_offsets
    offs = field_offsets(cfg.model)
    ids = jnp.asarray(np.stack(
        [rng.integers(0, v, size=256) for v in cfg.model.vocab_sizes],
        axis=1).astype(np.int32) + offs[None, :].astype(np.int32))
    labels = jnp.asarray((rng.random(256) < 0.4).astype(np.float32))
    losses = []
    for _ in range(8):
        state, m = step(state, ids, None, labels)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert state.params["embed"]["table"].dtype == jnp.bfloat16
    # same batch 8x must drive its loss down even through bf16 rounding
    assert losses[-1] < losses[0]
