"""Negative downsampling (data.neg_downsample) + calibration-offset
correction at eval/serving."""

import dataclasses
import math

import numpy as np

from cffm_tpu.config import get_config
from cffm_tpu.data.loader import downsampled_batches
from cffm_tpu.metrics import calibration_offset


def _stream(n_batches, b=128, pos_rate=0.25, dense=True, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        labels = (rng.random(b) < pos_rate).astype(np.float32)
        # ids encode the label so row alignment is checkable post-filter
        ids = np.stack([labels.astype(np.int32) + 10,
                        rng.integers(0, 50, b).astype(np.int32)], axis=1)
        d = rng.normal(size=(b, 3)).astype(np.float32) if dense else None
        yield ids, d, labels


def test_downsample_keeps_positives_drops_negatives():
    rate = 0.25
    out = list(downsampled_batches(_stream(200), rate, seed=1))
    assert out, "no batches emitted"
    ids = np.concatenate([o[0] for o in out])
    labels = np.concatenate([o[2] for o in out])
    # exact batch shapes
    assert all(len(o[2]) == 128 for o in out)
    # row alignment survives the filter/rebatch (id col 0 encodes label)
    np.testing.assert_array_equal(ids[:, 0], labels.astype(np.int32) + 10)
    # negative survival ~ rate: in-stream neg:pos was 3:1; after
    # sampling at 0.25 it should be ~0.75:1
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    ratio = n_neg / n_pos
    assert 0.55 < ratio < 1.0, ratio
    # dense columns ride along
    assert out[0][1].shape == (128, 3)


def test_downsample_dense_none():
    out = list(downsampled_batches(_stream(20, dense=False), 0.5, seed=2))
    assert out and out[0][1] is None


def test_downsample_rate_one_is_identity_config():
    # loader only wraps when 0 < rate < 1; the helper itself at rate
    # ~1.0 keeps everything
    src = list(_stream(5, seed=3))
    out = list(downsampled_batches(iter(src), 0.999999, seed=3))
    got = np.concatenate([o[2] for o in out])
    want = np.concatenate([s[2] for s in src])
    assert len(got) >= len(want) - 128  # at most one partial tail held


def test_calibration_offset_math():
    cfg = get_config("movielens")
    assert calibration_offset(cfg.data) == 0.0
    d = dataclasses.replace(cfg.data, neg_downsample=0.25)
    assert abs(calibration_offset(d) - math.log(0.25)) < 1e-12


def test_downsampled_training_stays_calibrated():
    """Train on a 0.35-downsampled synthetic stream; the corrected eval
    must stay calibrated against the TRUE (un-downsampled) val stream
    and still rank (AUC over the floor)."""
    from cffm_tpu import train as train_lib

    cfg = get_config("movielens")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_pallas=False),
        data=dataclasses.replace(cfg.data, dataset="synthetic",
                                 batch_size=512, num_train_steps=400,
                                 eval_batches=8, neg_downsample=0.35),
        log_every=1000,
    )
    out = train_lib.run(cfg)
    assert out["auc"] > 0.55, out
    # without the +ln(0.35) correction calibration would sit near
    # 1/0.35 ~ 2.9x; corrected it must be near 1
    assert 0.75 < out["calibration"] < 1.3, out
