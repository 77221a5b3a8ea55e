"""Unit tests: metrics accumulation math, mesh construction, preset
invariants, and the --mesh CLI path."""

import numpy as np
import pytest

from pointcloud_orientation_tpu.parallel import data_axis_size, make_mesh
from pointcloud_orientation_tpu.train import PRESETS, MetricsAccumulator, preset
from pointcloud_orientation_tpu.train.metrics import (
    masked_angular_mean,
    write_mvm_results_txt,
    write_summary_txt,
)


def test_metrics_accumulator_weighted_means():
    acc = MetricsAccumulator(["a", "b"])
    acc.update(np.asarray([1.0, 3.0]), np.asarray([0, 1]), np.asarray([1.0, 1.0]),
               angular=np.asarray([10.0, np.nan]))
    acc.update(np.asarray([5.0, 7.0]), np.asarray([0, 0]), np.asarray([1.0, 0.0]),
               angular=np.asarray([20.0, 30.0]))
    # masked sample (valid=0) excluded everywhere
    assert acc.mean_loss == pytest.approx((1 + 3 + 5) / 3)
    per = acc.per_class_mean()
    assert per["a"] == pytest.approx((1 + 5) / 2)
    assert per["b"] == pytest.approx(3.0)
    # NaN angular and masked angular excluded
    assert acc.mean_angular_error == pytest.approx((10 + 20) / 2)


def test_masked_angular_mean_matches_accumulator_semantics():
    """The vmapped protocols' helper must skip NaN-marked (undefined) and
    invalid samples exactly like MetricsAccumulator — one uniform-class
    NaN must not poison the mean (the bug this pins was found in the
    vmapped multi-seed artifacts: test_angular == NaN for 8dir_kl)."""
    ang = np.asarray([[10.0, np.nan], [20.0, 30.0]])
    valid = np.asarray([[1.0, 1.0], [1.0, 0.0]])
    assert masked_angular_mean(ang, valid) == pytest.approx((10 + 20) / 2)
    # all samples undefined -> NaN (matches mean_angular_error's empty case)
    assert np.isnan(masked_angular_mean(np.asarray([np.nan]), np.asarray([1.0])))
    assert np.isnan(masked_angular_mean(np.asarray([5.0]), np.asarray([0.0])))


def test_metrics_accumulator_empty_class_nan():
    acc = MetricsAccumulator(["a", "b"])
    acc.update(np.asarray([1.0]), np.asarray([0]), np.asarray([1.0]))
    per = acc.per_class_mean()
    assert np.isnan(per["b"])


def test_summary_txt_format(tmp_path):
    p = tmp_path / "summary.txt"
    write_summary_txt(str(p), {"chair": 0.1234567, "sofa": 0.5}, overall=0.3)
    lines = p.read_text().splitlines()
    assert lines[0] == "chair\t0.123457"
    assert lines[-1] == "Overall\t0.300000"


def test_mvm_results_format(tmp_path):
    hist = {
        "total": {"train": [1.0, 0.5], "val": [1.2, 0.6]},
        "chair": {"train": [1.0, 0.4], "val": [1.1, 0.5]},
    }
    p = tmp_path / "results.txt"
    write_mvm_results_txt(str(p), ["chair"], hist, test_kl=0.077, best_val_epoch=2)
    text = p.read_text()
    assert "Best Total Val Epoch: 2" in text
    assert "Test KL: 0.077000" in text
    assert "[TOTAL] Train=0.500000 Val=0.600000" in text
    assert "[chair] Train=0.400000 Val=0.500000" in text


def test_make_mesh_shapes():
    mesh = make_mesh(("data",))
    assert mesh.shape["data"] == 8
    mesh2 = make_mesh(("data", "model"), (4, 2))
    assert mesh2.shape == {"data": 4, "model": 2}
    mesh3 = make_mesh(("data", "model"), (-1, 2))
    assert mesh3.shape["data"] == 4
    with pytest.raises(ValueError):
        make_mesh(("data", "model"), (3, 2))
    assert data_axis_size(mesh) == 8
    assert data_axis_size(None) == 1


def test_presets_invariants():
    for name, cfg in PRESETS.items():
        assert cfg.task in (
            "forward_mse", "forward_mse_aux", "axes", "8dir_mse", "8dir_kl",
            "multi_8dir", "vm_kl", "mvm", "classification",
        ), name
        assert cfg.batch_size == 16 and cfg.lr == 1e-3 and cfg.seed == 42
        if cfg.task == "mvm":
            assert cfg.epochs == 100 and cfg.grad_clip == 1.0
        elif name not in ("point_transformer", "moe_point_transformer"):
            assert cfg.epochs == 200
    # overrides don't mutate the preset
    a = preset("8dir_kl", epochs=5)
    assert a.epochs == 5 and PRESETS["8dir_kl"].epochs == 200
    # mvm_spread changes ONLY the init relative to the parity preset
    # (RESULTS.md bistability study): objective knobs stay at parity values
    sp, par = PRESETS["mvm_spread"], PRESETS["mvm"]
    assert sp.mvm_mu_init == "spread" and par.mvm_mu_init == "zero"
    assert sp.mvm_weight_floor == 0.0 == par.mvm_weight_floor
    assert sp.mvm_unmatched_penalty == 0.0 == par.mvm_unmatched_penalty
    assert sp.replace(mvm_mu_init="zero") == par


def test_cli_mesh_flag(tmp_path):
    from pointcloud_orientation_tpu.train import run as cli

    out = tmp_path / "dp"
    cli.main([
        "--preset", "vm_kl", "--data", "synthetic", "--epochs", "1",
        "--num-points", "128", "--batch-size", "8",
        "--mesh", "data:8", "--out", str(out),
    ])
    assert (out / "summary.txt").exists()
