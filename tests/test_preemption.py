"""Preemption-safe shutdown (SURVEY.md §6 failure-detection row):
a stop request mid-run saves a checkpoint at an agreed step; resuming
completes the run bit-identically to an uninterrupted control."""

import dataclasses

import jax
import numpy as np
import pytest

from cffm_tpu import train as train_lib
from cffm_tpu.config import DataConfig, ModelConfig, OptimizerConfig, TrainConfig
from cffm_tpu.utils.preemption import PreemptionGuard


def _cfg(steps, ckpt_dir=None):
    return TrainConfig(
        name="preempt_test",
        model=ModelConfig(
            num_fields=4, vocab_sizes=(64, 64, 64, 64), embed_dim=8,
            cross="field_aware", conv_channels=(8,), tower_hidden=(16,),
            compute_dtype="float32", use_pallas=False,
        ),
        data=DataConfig(batch_size=256, num_train_steps=steps,
                        eval_batches=2, seed=0),
        optim=OptimizerConfig(sparse_optimizer="adagrad"),
        checkpoint_dir=ckpt_dir,
        checkpoint_every=100,  # periodic saves alone would miss step 4
        log_every=2,           # stop_every rides log_every
    )


class _TriggerAtStep:
    """log_fn hook that fires the guard when a given step is logged —
    deterministic stand-in for an async SIGTERM."""

    def __init__(self, guard, step):
        self.guard, self.step = guard, step

    def __call__(self, line):
        if f'"step": {self.step},' in line:
            self.guard.request()


def test_preempt_saves_and_resume_is_bit_identical(tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # control: uninterrupted 8-step run, no checkpointing
    r_ctl = train_lib.run(_cfg(8), log_fn=lambda s: None,
                          preemption_guard=PreemptionGuard(install=False))

    # preempted run: request stop as step 4's log line appears ->
    # guard.sync() trips at the step-4 boundary
    guard = PreemptionGuard(install=False)
    logs = []

    def log(line):
        logs.append(line)
        _TriggerAtStep(guard, 4)(line)

    r_a = train_lib.run(_cfg(8, ckpt), log_fn=log, preemption_guard=guard)
    assert r_a["preempted_at_step"] == 4
    assert any('"preempted_at_step": 4' in l for l in logs)

    # resume: restores the step-4 checkpoint (NOT a bogus step-8 one)
    # and completes; final eval must match the uninterrupted control
    r_b = train_lib.run(_cfg(8, ckpt), log_fn=lambda s: None,
                        preemption_guard=PreemptionGuard(install=False))
    assert "preempted_at_step" not in r_b
    assert r_b["logloss"] == r_ctl["logloss"], (r_b, r_ctl)
    assert r_b["auc"] == r_ctl["auc"]
    assert r_b["final_train_loss"] == r_ctl["final_train_loss"]


def test_guard_signal_handler_roundtrip():
    """The real SIGTERM path: handler sets the flag; close() restores."""
    import os
    import signal

    guard = PreemptionGuard()
    if not guard._installed:
        pytest.skip("not main thread")
    assert not guard.requested
    os.kill(os.getpid(), signal.SIGTERM)
    assert guard.requested
    assert guard.sync()  # single-process: no collective
    guard.close()
    # handler restored: a second guard can install again
    g2 = PreemptionGuard()
    assert not g2.requested
    g2.close()