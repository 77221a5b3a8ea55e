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


_BENCH_KEYS = {"metric", "value", "unit", "vs_baseline", "rounds"}


def _run_bench(extra_env, timeout=900):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_BATCH="2",
        BENCH_POINTS="128",
        BENCH_STEPS="1",
    )
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, env=env, timeout=timeout,  # compile-bound; generous for loaded hosts
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def test_bench_smoke():
    """bench.py prints one parseable JSON record PER completed round (the
    r4 hardening: a mid-run hang still leaves a driver-parseable line);
    every line carries the full schema and the last is the final median."""
    out = _run_bench({"BENCH_ROUNDS": "2"})
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 2  # one record per round
    for i, line in enumerate(lines):
        payload = json.loads(line)
        assert set(payload) == _BENCH_KEYS
        assert payload["value"] > 0 and payload["vs_baseline"] > 0
        assert payload["rounds"] == i + 1


def test_bench_survives_hung_fetch():
    """Simulated tunnel hang (BENCH_SIMULATE_HANG_AT=3: the first measured
    train fetch, post-compile): the fetch never returns, the watchdog times
    it out, the retry re-dispatches, and a valid JSON record is still
    emitted with rc=0 — the BENCH_r04 failure mode can no longer erase the
    round record."""
    out = _run_bench(
        {
            "BENCH_ROUNDS": "1",
            "BENCH_SIMULATE_HANG_AT": "3",
            "BENCH_FETCH_TIMEOUT_S": "3",
        }
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "fetch hung" in out.stderr  # the watchdog actually fired
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert set(payload) == _BENCH_KEYS
    assert payload["value"] > 0


def test_bench_n10k_smoke(tmp_path):
    """benchmarks/bench_n10k.py (the canonical-N serving record, VERDICT r4
    #7) runs hermetically on CPU at tiny shapes: one JSON line per knn mode
    (exact + approx) and a record file with both modes' values."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH10K_BATCH="2",
        BENCH10K_POINTS="256",
        BENCH10K_STEPS="1",
        BENCH10K_ROUNDS="1",
        BENCH10K_WARMUP_TIMEOUT_S="600",
        BENCH10K_OUT=str(tmp_path / "rec.json"),
    )
    out = subprocess.run(
        [sys.executable, "benchmarks/bench_n10k.py"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 2
    assert [json.loads(l)["mode"] for l in lines] == ["exact", "approx"]
    rec = json.loads((tmp_path / "rec.json").read_text())
    assert set(rec["modes"]) == {"exact", "approx"}
    for m in rec["modes"].values():
        assert m["value"] > 0 and m["vs_baseline"] > 0
