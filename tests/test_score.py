"""Scoring path: train -> checkpoint -> score produces sane CTRs."""

import dataclasses
import tempfile

import numpy as np

from cffm_tpu import train as train_lib
from cffm_tpu.config import DataConfig, ModelConfig, TrainConfig
from cffm_tpu.score import score


def test_train_checkpoint_score(tmp_path):
    cfg = TrainConfig(
        name="score_test",
        model=ModelConfig(
            num_fields=4, vocab_sizes=(32, 32, 32, 32), embed_dim=8,
            cross="field_aware", conv_channels=(8,), tower_hidden=(16,),
            compute_dtype="float32", use_pallas=False,
        ),
        data=DataConfig(batch_size=256, num_train_steps=30, eval_batches=4),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_every=0,
    )
    train_lib.run(cfg, log_fn=lambda s: None)

    out = tmp_path / "preds.txt"
    result = score(cfg, num_batches=4, output=str(out), log_fn=lambda s: None)
    assert result["count"] == 4 * 256
    preds = np.loadtxt(out)
    assert preds.shape == (4 * 256,)
    assert (preds >= 0).all() and (preds <= 1).all()
    assert np.isfinite(result["logloss"])
