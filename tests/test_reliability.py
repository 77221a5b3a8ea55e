"""Preemption-safe training (``train/reliability.py``) + async checkpoints.

Pins: the guard catches a real SIGTERM; fit() stops at the next epoch
boundary, saves a resumable checkpoint, and the resumed run continues;
asynchronous checkpoint writes commit the same bytes as synchronous ones.
"""

import os
import signal

import jax
import numpy as np
import pytest

from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.train import PreemptionGuard, Trainer, preset


@pytest.fixture(scope="module")
def ds():
    return OrientationDataset.synthetic(samples_per_class=8, num_points=128)


def _cfg(**kw):
    base = dict(num_points=128, batch_size=8, epochs=3)
    base.update(kw)
    return preset("simple_pointnet", classes=("chair",)).replace(**base)


def _params_equal(a, b, atol=0.0):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol
        ),
        a,
        b,
    )


def test_guard_catches_sigterm_and_one_shots():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.requested
        assert guard.signum == signal.SIGTERM
        # one-shot: the original handler is already back
        assert signal.getsignal(signal.SIGTERM) == before
    assert signal.getsignal(signal.SIGTERM) == before


def test_guard_restores_handler_on_exit_without_signal():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard():
        assert signal.getsignal(signal.SIGTERM) != before
    assert signal.getsignal(signal.SIGTERM) == before


def test_preempted_fit_saves_checkpoint_and_resumes(ds, tmp_path):
    # stepwise path (checkpoint_every set); guard fires before epoch 1's
    # boundary => fit stops after epoch 1 and writes step_1
    cfg = _cfg(checkpoint_every=100)  # periodic write never fires on its own
    preempted = Trainer(cfg, ds)
    guard = PreemptionGuard()
    guard.request()
    ckpt_dir = str(tmp_path / "ck")
    preempted.fit(epochs=3, log_every=0, checkpoint_dir=ckpt_dir,
                  preemption_guard=guard)
    assert len(preempted.history["train"]) == 1
    assert os.path.isdir(os.path.join(ckpt_dir, "step_1"))

    # resume reproduces the uninterrupted run exactly
    straight = Trainer(cfg, ds)
    straight.fit(epochs=3, log_every=0)
    resumed = Trainer(cfg, ds)
    resumed.restore_checkpoint(os.path.join(ckpt_dir, "step_1"))
    resumed.fit(epochs=3, start_epoch=2, log_every=0)
    _params_equal(straight.state.params, resumed.state.params, atol=1e-6)


def test_preempted_fit_blocks_path_stops_early(ds, monkeypatch):
    monkeypatch.setenv("PCOT_EPOCH_BLOCK", "2")
    cfg = _cfg()
    trainer = Trainer(cfg, ds)
    guard = PreemptionGuard()
    guard.request()
    trainer.fit(epochs=6, log_every=0, preemption_guard=guard)
    # stopped after the first 2-epoch block, not all 6
    assert len(trainer.history["train"]) == 2


def test_async_checkpoint_matches_sync(ds, tmp_path):
    cfg = _cfg()
    trainer = Trainer(cfg, ds)
    trainer.fit(epochs=1, log_every=0)
    sync_path = trainer.save_checkpoint(str(tmp_path / "sync"), step=1)
    async_path = trainer.save_checkpoint(
        str(tmp_path / "async"), step=1, asynchronous=True
    )
    trainer.wait_for_checkpoints()

    a = Trainer(cfg, ds)
    a.restore_checkpoint(sync_path)
    b = Trainer(cfg, ds)
    b.restore_checkpoint(async_path)
    _params_equal(a.state.params, b.state.params)
    _params_equal(a.state.opt_state, b.state.opt_state)
    assert int(a.state.step) == int(b.state.step)
