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


def test_debug_harness_deep_checks(tiny_ds, tmp_path):
    """debug_checks=True runs the deep `_debug` harness: per-step loss,
    per-sample values, per-sample model-output dump (mu/kappa/w for the vM
    heads) and per-parameter grad finiteness all land in debug_log.txt
    (`train_multi_peaks_vonMises_KL_debug.py:89-95,277-306`)."""
    cfg = _tiny(
        preset("mvm", classes=("chair", "bottle", "bowl", "plant", "sofa", "toilet"))
    ).replace(debug_checks=True, out_dir=str(tmp_path))
    tr = Trainer(cfg, tiny_ds)
    hist = tr.fit(epochs=1, log_every=0)
    assert np.isfinite(hist["train"][0])
    log = (tmp_path / "debug_log.txt").read_text()
    assert "loss=" in log and "per_sample=" in log
    # per-sample output dump: the MvM head's three (B, K) arrays
    assert log.count("[0]") or "out" in log  # keystr-named leaves present
    assert "grads:" in log and "non-finite: none" in log


def test_debug_check_raises_on_nan_grad(tiny_ds, tmp_path):
    """A NaN born in a gradient is caught and named even when the loss
    itself is finite (the case the loss-only check misses)."""
    cfg = _tiny(preset("simple_pointnet", classes=("chair",))).replace(
        debug_checks=True, out_dir=str(tmp_path)
    )
    tr = Trainer(cfg, tiny_ds)
    metrics = {
        "loss": np.float32(0.5),
        "per_sample": np.zeros(4, np.float32),
        "angular": np.zeros(4, np.float32),
        "grad_finite": {"['Dense_0']['kernel']": np.bool_(False)},
    }
    with pytest.raises(FloatingPointError, match=r"Dense_0.*kernel"):
        tr._debug_check(metrics, epoch=1, batch_idx=0)


def test_debug_check_raises_on_nan_output(tiny_ds, tmp_path):
    cfg = _tiny(preset("simple_pointnet", classes=("chair",))).replace(
        debug_checks=True, out_dir=str(tmp_path)
    )
    tr = Trainer(cfg, tiny_ds)
    bad = np.ones((4, 3), np.float32)
    bad[1, 2] = np.nan
    metrics = {
        "loss": np.float32(0.5),
        "per_sample": np.zeros(4, np.float32),
        "angular": np.zeros(4, np.float32),
        "outputs": (bad,),
    }
    with pytest.raises(FloatingPointError, match="model output"):
        tr._debug_check(metrics, epoch=1, batch_idx=0)


def test_debug_check_raises_on_bessel_overflow_kappa(tiny_ds, tmp_path):
    """An inf kappa output is flagged as a non-finite model output before it
    can poison the Bessel terms (`..._debug.py:49-56`); a huge-but-finite
    kappa passes because the stack computes SCALED i0e/i1e, never raw i0."""
    cfg = _tiny(preset("vm_kl")).replace(debug_checks=True, out_dir=str(tmp_path))
    tr = Trainer(cfg, tiny_ds)
    ok_kappa = np.full((2, 1), 1e30, np.float32)  # raw i0 overflows, i0e fine
    metrics = {
        "loss": np.float32(0.1),
        "per_sample": np.zeros(2, np.float32),
        "angular": np.zeros(2, np.float32),
        "outputs": {"mu": np.zeros((2, 1), np.float32), "kappa": ok_kappa},
    }
    tr._debug_check(metrics, epoch=0, batch_idx=0)  # must not raise


def test_host_resident_streaming_matches_resident_path(tiny_ds):
    """cfg.host_resident=True streams one batch per step from host memory
    (for splits larger than device memory) but builds PRNG keys from the
    same absolute epoch/step numbers as the device-resident scan path — the
    two runs must agree to float noise (different compiled programs, same
    math)."""
    cfg = _tiny(preset("8dir_kl", classes=("chair", "bottle")))
    base = Trainer(cfg, tiny_ds)
    base.fit(log_every=0)
    stream = Trainer(cfg.replace(host_resident=True), tiny_ds)
    stream.fit(log_every=0)
    np.testing.assert_allclose(
        stream.history["train"], base.history["train"], rtol=5e-4)
    np.testing.assert_allclose(
        stream.history["val"], base.history["val"], rtol=5e-4)
    np.testing.assert_allclose(stream.best_val, base.best_val, rtol=5e-4)
    t_base, t_stream = base.test(), stream.test()
    np.testing.assert_allclose(
        t_stream.mean_loss, t_base.mean_loss, rtol=1e-3)
