"""Converged-AUC cross-check vs the torch-CPU oracle (SURVEY.md §5.4):
same init, same batch stream, independent implementations + optimizers
-> held-out AUC must agree within run-to-run variance."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from cffm_tpu import metrics, train as train_lib
from cffm_tpu.config import DataConfig, ModelConfig, OptimizerConfig, TrainConfig
from cffm_tpu.data.synthetic import SyntheticCTR
from cffm_tpu.models.cffm import field_offsets
from oracle.torch_cffm import forward_numpy, train_oracle

pytestmark = pytest.mark.slow


def _cfg():
    return TrainConfig(
        name="oracle_conv",
        model=ModelConfig(
            num_fields=6, vocab_sizes=(64, 96, 128, 64, 48, 32), embed_dim=8,
            cross="field_aware", conv_channels=(16,), conv_pool=2,
            tower_hidden=(32,), compute_dtype="float32", use_pallas=False,
        ),
        optim=OptimizerConfig(dense_optimizer="adam", sparse_optimizer="adagrad",
                              dense_lr=1e-3, sparse_lr=2e-2),
        data=DataConfig(batch_size=512),
    )


def test_converged_auc_matches_torch_oracle():
    cfg = _cfg()
    steps = 250
    offsets = field_offsets(cfg.model)[None, :].astype(np.int32)

    train_stream = SyntheticCTR(cfg.model, cfg.data.batch_size, seed=0,
                                stream_seed=1)
    batches = []
    for _ in range(steps):
        ids, dense, labels = train_stream.next_batch()
        batches.append(((ids + offsets).astype(np.int32), dense, labels))

    state = train_lib.create_state(cfg, jax.random.key(0))
    params0 = jax.tree.map(np.asarray, state.params)

    # JAX training
    for ids, dense, labels in batches:
        state, _ = train_lib.train_step(
            state, jnp.asarray(ids), None, jnp.asarray(labels), cfg)

    # torch oracle training from the SAME init on the SAME stream
    torch_params = train_oracle(params0, cfg.model, cfg.optim,
                                [(i, None, l) for i, _d, l in batches])

    # held-out val stream (same planted world, disjoint sample stream)
    val_stream = SyntheticCTR(cfg.model, 4096, seed=0, stream_seed=104729)
    ids, _dense, labels = val_stream.next_batch()
    gids = (ids + offsets).astype(np.int32)

    from cffm_tpu.models.cffm import forward

    logits_jax = np.asarray(forward(state.params, jnp.asarray(gids), None,
                                    cfg.model))
    logits_torch = forward_numpy(torch_params, gids, None, cfg.model)

    auc_jax = float(metrics.auc_exact(logits_jax, labels))
    auc_torch = float(metrics.auc_exact(logits_torch, labels))

    # both learn the planted interactions (0.587 measured at 250 steps)
    # and agree far inside run-to-run variance (measured delta 1.3e-5,
    # logit correlation 0.9999997 — the implementations are the same
    # model+optimizer down to float noise)
    assert auc_jax > 0.57, auc_jax
    assert auc_torch > 0.57, auc_torch
    assert abs(auc_jax - auc_torch) < 0.005, (auc_jax, auc_torch)
