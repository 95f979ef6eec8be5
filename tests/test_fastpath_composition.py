"""The flagship composition in one training loop (interpret mode):
full-rows Pallas interaction kernel + streamed full-table sparse update
+ per-field batched sort — the exact program criteo configs run on the
chip. Covered piecewise elsewhere; this exercises their interaction
end-to-end and pins learning."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu.config import (DataConfig, ModelConfig, OptimizerConfig,
                             TrainConfig)
from cffm_tpu.models.cffm import field_offsets
from cffm_tpu.train import create_state, default_interaction_fn, train_step


def _cfg():
    # F=15, d=16 -> row_width 240, table_width 256 (fused linear);
    # streamed_update forced on despite the small table.
    return TrainConfig(
        name="fastpath",
        model=ModelConfig(
            num_fields=15,
            vocab_sizes=tuple([64] * 15),
            embed_dim=16,
            cross="field_aware",
            conv_channels=(16,),
            conv_pool=2,
            tower_hidden=(32,),
            compute_dtype="bfloat16",
            use_first_order=True,
            use_pallas=True,
        ),
        optim=OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.05,
                              streamed_update="on"),
        data=DataConfig(batch_size=256, seed=3),
    )


@pytest.mark.slow
def test_fastpath_training_learns_planted_signal():
    cfg = _cfg()
    mcfg = cfg.model
    assert mcfg.fused_linear  # full-rows path preconditions
    rng = np.random.default_rng(0)
    b = cfg.data.batch_size

    # planted world: one weight vector over field-0/1 id parity
    def batch(seed):
        r = np.random.default_rng(seed)
        ids = np.stack([r.integers(0, v, size=b) for v in mcfg.vocab_sizes],
                       axis=1).astype(np.int32)
        logit = ((ids[:, 0] % 2) * 2.0 - 1.0) + ((ids[:, 1] % 3) - 1.0)
        labels = (r.random(b) < 1 / (1 + np.exp(-logit))).astype(np.float32)
        gids = ids + field_offsets(mcfg)[None, :].astype(np.int32)
        dense = r.normal(size=(b, mcfg.num_dense)).astype(np.float32) \
            if mcfg.num_dense else None
        return (jnp.asarray(gids),
                None if dense is None else jnp.asarray(dense),
                jnp.asarray(labels))

    fn = default_interaction_fn(cfg)
    state = create_state(cfg, jax.random.key(0))
    t0 = np.asarray(state.params["embed"]["table"])
    losses = []
    for s in range(60):
        ids, dense, labels = batch(s % 7)
        state, m = train_step(state, ids, dense, labels, cfg, fn)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses[-5:]
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first - 0.02, (first, last)

    # the streamed update must leave never-touched rows bit-identical
    touched = np.zeros(t0.shape[0], bool)
    for s in range(7):
        ids, _, _ = batch(s)
        touched[np.asarray(ids).reshape(-1)] = True
    t1 = np.asarray(state.params["embed"]["table"])
    np.testing.assert_array_equal(t1[~touched], t0[~touched])
