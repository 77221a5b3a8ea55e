"""Cross-stack evaluation: a reference torch checkpoint evaluated through
our stack, plus the bench contract."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.train import preset
from pointcloud_orientation_tpu.train.evaluate import evaluate


def test_evaluate_with_torch_checkpoint(tmp_path):
    """Save a freshly-initialized torch reference model, import it, and
    evaluate — exercises the whole .pth -> flax -> eval pipeline."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference/models"):
        pytest.skip("reference not mounted")
    sys.path.insert(0, "/root/reference")
    from models.pointnet_pp_8dir import PointNetPP8Dir as TorchModel

    tm = TorchModel()
    ckpt = tmp_path / "ref.pth"
    torch.save(tm.state_dict(), ckpt)

    ds = OrientationDataset.synthetic(samples_per_class=8, num_points=256)
    cfg = preset("8dir_kl").replace(num_points=128, batch_size=8)
    result = evaluate(cfg, ds, torch_ckpt=str(ckpt))
    assert np.isfinite(result["loss"])
    assert result["count"] > 0


def test_bench_smoke():
    """bench.py prints exactly one JSON line with the required keys (tiny
    shapes on CPU)."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_BATCH="2",
        BENCH_POINTS="128",
        BENCH_STEPS="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, env=env, timeout=900,  # compile-bound; generous for loaded hosts
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0 and payload["vs_baseline"] > 0
