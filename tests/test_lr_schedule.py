"""Opt-in LR schedules (TrainConfig.lr_schedule; default stays the
reference's constant lr — `train_8dir_KL.py:101` uses plain Adam(1e-3)).

Pins the schedule shape (warmup ramp to peak, cosine decay to ~0 at the
config's epoch horizon) and that a scheduled trainer actually trains.
"""

import numpy as np
import pytest

from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.train import Trainer, preset


def _cfg(**kw):
    return preset("8dir_kl").replace(
        num_points=128, batch_size=8, epochs=4, **kw)


def _ds():
    return OrientationDataset.synthetic(samples_per_class=4, num_points=160)


def test_constant_lr_by_default():
    trainer = Trainer(_cfg(), _ds())
    assert trainer.lr_schedule is None


def test_cosine_schedule_shape():
    cfg = _cfg(lr_schedule="cosine", warmup_epochs=1)
    trainer = Trainer(cfg, _ds())
    sched = trainer.lr_schedule
    steps_per_epoch = max(1, -(-len(trainer.train_ds) // cfg.batch_size))
    total = steps_per_epoch * cfg.epochs
    warmup = steps_per_epoch * cfg.warmup_epochs
    assert float(sched(0)) == 0.0                      # warmup starts at 0
    np.testing.assert_allclose(float(sched(warmup)), cfg.lr, rtol=1e-6)
    assert float(sched(total)) < 0.05 * cfg.lr          # decayed to ~0
    mid = float(sched(warmup + (total - warmup) // 2))
    assert 0.1 * cfg.lr < mid < cfg.lr                  # monotone in between


def test_cosine_without_warmup_starts_at_peak():
    trainer = Trainer(_cfg(lr_schedule="cosine"), _ds())
    np.testing.assert_allclose(
        float(trainer.lr_schedule(0)), trainer.cfg.lr, rtol=1e-6)


def test_unknown_schedule_rejected():
    with pytest.raises(ValueError, match="lr_schedule"):
        Trainer(_cfg(lr_schedule="linear"), _ds())


def test_scheduled_training_runs_and_is_finite():
    trainer = Trainer(_cfg(lr_schedule="cosine", warmup_epochs=1), _ds())
    trainer.fit(epochs=2, log_every=0)
    assert all(np.isfinite(v) for v in trainer.history["train"])
