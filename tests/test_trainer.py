"""Trainer end-to-end smoke tests on synthetic data (CPU, tiny shapes)."""

import os

import jax
import numpy as np
import pytest

from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.parallel import make_mesh
from pointcloud_orientation_tpu.train import Trainer, preset


@pytest.fixture(scope="module")
def tiny_ds():
    return OrientationDataset.synthetic(samples_per_class=8, num_points=256)


def _tiny(cfg):
    return cfg.replace(num_points=128, batch_size=8, epochs=2)


def test_simple_pointnet_trains(tiny_ds):
    cfg = _tiny(preset("simple_pointnet", classes=("chair",)))
    tr = Trainer(cfg, tiny_ds)
    hist = tr.fit(log_every=0)
    assert len(hist["train"]) == 2
    assert all(np.isfinite(hist["train"]))
    assert all(np.isfinite(hist["val"]))


def test_8dir_kl_full_protocol(tiny_ds, tmp_path):
    cfg = _tiny(preset("8dir_kl"))
    tr = Trainer(cfg, tiny_ds)
    tr.fit(log_every=0)
    assert tr.best_params is not None
    test_acc = tr.test()
    assert np.isfinite(test_acc.mean_loss)
    # per-class buckets populated
    per_class = test_acc.per_class_mean()
    assert set(per_class) == set(tiny_ds.class_names)
    # artifact contract
    out = tmp_path / "run"
    tr.write_artifacts(str(out), test_acc)
    assert (out / "summary.txt").exists()
    assert (out / "loss_curve.png").exists()
    text = (out / "summary.txt").read_text()
    assert "Overall" in text and "chair" in text


def test_checkpoint_roundtrip(tiny_ds, tmp_path):
    cfg = _tiny(preset("simple_pointnet", classes=("chair",)))
    tr = Trainer(cfg, tiny_ds)
    tr.fit(epochs=1, log_every=0)
    path = tr.save_checkpoint(str(tmp_path / "ckpt"))
    before = jax.tree_util.tree_map(np.asarray, tr.state.params)

    tr2 = Trainer(cfg, tiny_ds)
    tr2.restore_checkpoint(path)
    after = jax.tree_util.tree_map(np.asarray, tr2.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b), before, after
    )
    # optimizer state restored too (resume-capable, unlike the reference)
    assert int(tr2.state.step) == int(tr.state.step)


def test_data_parallel_mesh(tiny_ds):
    mesh = make_mesh(("data",))
    assert mesh.shape["data"] == 8  # conftest forces 8 virtual devices
    cfg = _tiny(preset("vm_kl"))
    tr = Trainer(cfg, tiny_ds, mesh=mesh)
    hist = tr.fit(epochs=1, log_every=0)
    assert np.isfinite(hist["train"][0])
    # params replicated across the mesh
    leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_mvm_task_trains(tiny_ds):
    cfg = _tiny(preset("mvm", classes=("chair", "bottle", "bowl", "plant", "sofa", "toilet")))
    tr = Trainer(cfg, tiny_ds)
    hist = tr.fit(epochs=1, log_every=0)
    assert np.isfinite(hist["train"][0])
    va = tr._run_phase(tr.val_ds, train=False, epoch=0)
    assert np.isfinite(va.mean_loss)
