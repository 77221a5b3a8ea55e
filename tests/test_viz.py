"""Visualization: polar density renders and axes export decode."""

import numpy as np

from pointcloud_orientation_tpu.data import write_multi_peak_vm_txt
from pointcloud_orientation_tpu.utils.profiling import StepTimer
from pointcloud_orientation_tpu.viz import batch_plot_mvm, plot_mvm_polar
from pointcloud_orientation_tpu.viz.axes_export import (
    axes_from_two_heads,
    export_prediction_plys,
)


def test_plot_mvm_polar(tmp_path):
    out = tmp_path / "density.png"
    plot_mvm_polar([0.0, 3.1], [8.0, 8.0], [0.5, 0.5], str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_batch_plot_mvm(tmp_path):
    gt_root = tmp_path / "gt"
    (gt_root / "chair").mkdir(parents=True)
    params = np.zeros((4, 3), np.float32)
    params[0] = [0.3, 8.0, 1.0]
    write_multi_peak_vm_txt(params, 1, gt_root / "chair" / "c_multi_peak_vM_gt.txt")
    n = batch_plot_mvm("chair", str(gt_root), str(tmp_path / "out"))
    assert n == 1
    assert (tmp_path / "out" / "chair" / "c_multi_peak_vM_gt.png").exists()


def test_axes_from_two_heads_right_handed():
    vy = np.array([0.0, 1.0, 0.0])
    vz = np.array([0.0, 0.0, -1.0])
    vx, y, z = axes_from_two_heads(vy, vz)
    np.testing.assert_allclose(vx, [-1.0, 0, 0], atol=1e-6)  # cross(y, z)
    np.testing.assert_allclose(np.linalg.norm(vx), 1.0, atol=1e-6)


def test_export_prediction_plys(tmp_path, rng):
    clouds = rng.normal(size=(3, 20, 3)).astype(np.float32)

    def predict(cloud):
        return [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0, 0, 1.0])]

    n = export_prediction_plys(predict, clouds, str(tmp_path / "ply"), max_count=2)
    assert n == 2
    assert (tmp_path / "ply" / "sample_0_pred_1.ply").exists()


def test_step_timer():
    t = StepTimer()
    with t.track("data"):
        pass
    with t.track("data"):
        pass
    with t.track("step"):
        pass
    avg = t.averages()
    assert set(avg) == {"data", "step"}
    assert t.counts["data"] == 2
    t.reset()
    assert not t.totals
