"""CLI end-to-end on CPU with tiny shapes: artifacts + prediction exports."""

import os

import numpy as np
import pytest

from pointcloud_orientation_tpu.train import run as cli


def test_cli_single_run(tmp_path, monkeypatch):
    out = tmp_path / "out"
    cli.main(
        [
            "--preset", "vm_kl",
            "--data", "synthetic",
            "--epochs", "1",
            "--num-points", "128",
            "--batch-size", "8",
            "--out", str(out),
        ]
    )
    assert (out / "summary.txt").exists()
    assert (out / "loss_curve.png").exists()
    plys = list((out / "pred_ply").glob("*.ply"))
    assert len(plys) > 0


def test_cli_mvm_artifacts(tmp_path):
    out = tmp_path / "mvm"
    cli.main(
        [
            "--preset", "mvm",
            "--data", "synthetic",
            "--epochs", "1",
            "--num-points", "128",
            "--batch-size", "8",
            "--classes", "chair,bottle,bowl,sofa,toilet,plant",
            "--out", str(out),
        ]
    )
    assert (out / "results.txt").exists()
    text = (out / "results.txt").read_text()
    assert "Multi-Peak von Mises KL Summary" in text
    assert "Test KL" in text
    figs = list((out / "figs").glob("pred_density_*.png"))
    assert len(figs) > 0
