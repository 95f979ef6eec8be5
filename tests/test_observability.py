"""TensorBoard scalar writer + collective debug probes (SURVEY.md §6)."""

import dataclasses
import glob
import json
import os

import jax
import numpy as np
import pytest

from cffm_tpu.config import (DataConfig, ModelConfig, OptimizerConfig,
                             ShardingConfig, TrainConfig)
from cffm_tpu.models.cffm import field_offsets
from cffm_tpu.parallel.mesh import make_mesh
from cffm_tpu.parallel.sharded_train import (create_sharded_state,
                                             make_sharded_train_step)


def _cfg(**kw):
    return TrainConfig(
        name="test",
        model=ModelConfig(
            num_fields=4, vocab_sizes=(32, 64, 48, 16), embed_dim=8,
            cross="hadamard", conv_channels=(8,), conv_pool=2,
            tower_hidden=(16,), compute_dtype="float32", use_pallas=False),
        optim=OptimizerConfig(sparse_optimizer="adagrad",
                              dense_optimizer="adam"),
        data=DataConfig(batch_size=128, num_train_steps=3, val_every=0,
                        eval_batches=2),
        sharding=ShardingConfig(table_sharded=True),
        log_every=1,
        **kw,
    )


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = cfg.data.batch_size
    ids = np.stack([rng.integers(0, v, size=b)
                    for v in cfg.model.vocab_sizes], axis=1).astype(np.int32)
    ids += field_offsets(cfg.model)[None, :].astype(np.int32)
    labels = (rng.random(b) < 0.4).astype(np.float32)
    return ids, None, labels


def test_debug_barriers_probe_and_preserve_results(capfd):
    """debug_barriers=True emits [collective] heartbeats around every
    collective region and does not change the computed step."""
    cfg_off = _cfg()
    cfg_on = dataclasses.replace(cfg_off, debug_barriers=True)
    mesh = make_mesh()
    ids, dense, labels = _batch(cfg_off)

    s0 = create_sharded_state(cfg_off, jax.random.key(0), mesh)
    step_off = make_sharded_train_step(cfg_off, mesh)
    s_off, m_off = step_off(s0, ids, dense, labels)
    loss_off = float(m_off["loss"])
    capfd.readouterr()  # drain

    s1 = create_sharded_state(cfg_on, jax.random.key(0), mesh)
    step_on = make_sharded_train_step(cfg_on, mesh)
    s_on, m_on = step_on(s1, ids, dense, labels)
    loss_on = float(m_on["loss"])
    jax.effects_barrier()
    out = capfd.readouterr().out
    for tag in ("routing-a2a:enter", "lookup-a2a:exit", "grads-psum:exit",
                "grad-return-a2a:exit"):
        assert tag in out, f"missing probe {tag}"
    assert "shard=0" in out and "shard=7" in out  # every shard reported
    assert loss_on == pytest.approx(loss_off, abs=0)
    np.testing.assert_array_equal(
        np.asarray(s_on.params["embed"]["table"]),
        np.asarray(s_off.params["embed"]["table"]))


@pytest.mark.slow
def test_scalar_writer_writes_event_files(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from cffm_tpu.utils.tb import ScalarWriter

    d = str(tmp_path / "tb")
    w = ScalarWriter(d)
    w.scalars(1, {"train/loss": 0.7, "train/examples_per_s": 1000.0})
    w.scalars(2, {"train/loss": 0.6, "skip/str": "not-a-scalar"})
    w.close()
    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert files, "no event file written"
    # readable and contains our tags at the right steps
    seen = {}
    from tensorflow.python.summary.summary_iterator import summary_iterator
    for ev in summary_iterator(files[0]):
        for v in ev.summary.value:
            seen[(ev.step, v.tag)] = True
    assert (1, "train/loss") in seen and (2, "train/loss") in seen
    assert (1, "train/examples_per_s") in seen
    assert not any(t == "skip/str" for (_, t) in seen)


def test_scalar_writer_noop_without_dir(tmp_path):
    from cffm_tpu.utils.tb import ScalarWriter

    w = ScalarWriter(None)
    w.scalars(1, {"x": 1.0})  # must not raise
    w.close()


def test_run_writes_tensorboard(tmp_path):
    """train.run mirrors JSONL scalars into the event dir when
    tensorboard_dir is set (single-device synthetic smoke)."""
    pytest.importorskip("tensorflow")
    cfg = _cfg(tensorboard_dir=str(tmp_path / "tb"))
    cfg = dataclasses.replace(cfg, sharding=ShardingConfig(
        table_sharded=False))
    from cffm_tpu import train as train_lib

    logs = []
    res = train_lib.run(cfg, log_fn=lambda s: logs.append(json.loads(s)))
    assert "auc" in res
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert files
