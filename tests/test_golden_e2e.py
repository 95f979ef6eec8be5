"""Golden end-to-end (SURVEY.md §5.4): CPU training on synthetic data
with planted second-order structure must reach a pinned AUC band."""

import dataclasses

from cffm_tpu import train as train_lib
from cffm_tpu.config import DataConfig, ModelConfig, TrainConfig


def test_synthetic_convergence_auc_band():
    cfg = TrainConfig(
        name="golden",
        model=ModelConfig(
            num_fields=6, vocab_sizes=(128,) * 6, embed_dim=8,
            cross="field_aware", conv_channels=(16,), tower_hidden=(32,),
            compute_dtype="float32", use_pallas=False,
        ),
        data=DataConfig(batch_size=512, num_train_steps=500, eval_batches=8,
                        seed=7),
        optim=dataclasses.replace(
            TrainConfig("x", ModelConfig(1, (2,))).optim,
            sparse_lr=0.1, dense_lr=3e-3),
        log_every=0,
    )
    result = train_lib.run(cfg, log_fn=lambda s: None)
    # constant predictor = 0.5; the planted pairwise structure reaches
    # ~0.62+ in 500 steps; band is loose for run-to-run variance
    assert result["auc"] > 0.58, result
    assert result["logloss"] < 0.69, result
