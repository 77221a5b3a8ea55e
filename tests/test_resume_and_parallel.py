"""Checkpoint-resume bit-equivalence, DP-vs-single-device consistency, and
sequence-parallel attention correctness on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.models import PointTransformer
from pointcloud_orientation_tpu.parallel import make_mesh, replicate
from pointcloud_orientation_tpu.train import Trainer, preset


@pytest.fixture(scope="module")
def ds():
    return OrientationDataset.synthetic(samples_per_class=8, num_points=256)


def _params_equal(a, b, atol=0.0):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol),
        a, b,
    )


def test_resume_reproduces_uninterrupted_run(ds, tmp_path):
    cfg = preset("simple_pointnet", classes=("chair",)).replace(
        num_points=128, batch_size=8, epochs=3
    )
    straight = Trainer(cfg, ds)
    straight.fit(epochs=3, log_every=0)

    part1 = Trainer(cfg, ds)
    part1.fit(epochs=1, log_every=0)
    ckpt = part1.save_checkpoint(str(tmp_path / "ck"), step=1)

    part2 = Trainer(cfg, ds)
    part2.restore_checkpoint(ckpt)
    part2.fit(epochs=3, start_epoch=2, log_every=0)

    _params_equal(straight.state.params, part2.state.params, atol=1e-6)
    _params_equal(straight.state.batch_stats, part2.state.batch_stats, atol=1e-6)


def test_dp_matches_single_device(ds):
    """One epoch of DP training over the 8-device mesh produces the same
    parameters as single-device training (global-batch math is identical;
    XLA only changes the layout). SGD so that the comparison is meaningful —
    Adam normalizes away gradient magnitude and amplifies float summation
    -order noise from the sharded reduction to O(lr)."""
    cfg = preset("simple_pointnet", classes=("chair", "sofa")).replace(
        num_points=128, batch_size=8, epochs=1, optimizer="sgd"
    )
    single = Trainer(cfg, ds)
    single.fit(epochs=1, log_every=0)

    mesh = make_mesh(("data",))
    dp = Trainer(cfg, ds, mesh=mesh)
    dp.fit(epochs=1, log_every=0)

    _params_equal(single.state.params, dp.state.params, atol=2e-5)
    assert single.history["train"][0] == pytest.approx(
        dp.history["train"][0], abs=1e-5
    )


def test_sequence_parallel_attention_matches_unsharded():
    """PointTransformer output is invariant to sharding the point axis over
    the 'model' mesh axis (XLA inserts the K/V all-gathers)."""
    model = PointTransformer(depth=2, ffn_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)

    ref = model.apply(variables, x, train=False)

    mesh = make_mesh(("data", "model"), (4, 2))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    vs = replicate(variables, mesh)
    out = jax.jit(lambda v, a: model.apply(v, a, train=False))(vs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_per_label_runner(ds, tmp_path):
    from pointcloud_orientation_tpu.train.run import run_per_label

    cfg = preset("axes_all_labels").replace(
        num_points=128, batch_size=8, epochs=1, per_label=True
    )
    sub = ds.select_classes(["chair", "sofa"])
    summary = run_per_label(cfg, sub, str(tmp_path / "labels"))
    assert set(summary) == {"chair", "sofa"}
    text = (tmp_path / "labels" / "summary.txt").read_text()
    assert "chair" in text and "sofa" in text
    assert (tmp_path / "labels" / "chair" / "loss_curve.png").exists()


def test_per_label_runner_resume_skips_completed(ds, tmp_path):
    """resume=True skips labels whose metrics.json records a completed run
    at the same epoch budget (this carried two interrupted 40-label
    protocol runs); an incomplete or budget-mismatched label re-runs."""
    import json

    from pointcloud_orientation_tpu.train.run import run_per_label

    cfg = preset("axes_all_labels").replace(
        num_points=128, batch_size=8, epochs=1, per_label=True
    )
    sub = ds.select_classes(["chair", "sofa"])
    out = tmp_path / "labels"
    first = run_per_label(cfg, sub, str(out))

    # tamper with sofa's record so only chair counts as completed:
    # completion = full val history at this budget (run.py::_completed_best_val)
    sofa_metrics = out / "sofa" / "metrics.json"
    m = json.loads(sofa_metrics.read_text())
    m["history"]["val"] = []  # interrupted-looking run -> must re-run
    sofa_metrics.write_text(json.dumps(m))
    chair_mtime = (out / "chair" / "metrics.json").stat().st_mtime

    second = run_per_label(cfg, sub, str(out), resume=True)
    assert second["chair"] == pytest.approx(first["chair"])
    # chair skipped (not rewritten), sofa re-ran (full history restored)
    assert (out / "chair" / "metrics.json").stat().st_mtime == chair_mtime
    assert len(json.loads(sofa_metrics.read_text())["history"]["val"]) == 1
    text = (out / "summary.txt").read_text()
    assert "chair" in text and "sofa" in text


def test_dp_global_batch_invariance_across_mesh_sizes(ds):
    """The same global-batch training step is invariant to the data-mesh
    size (VERDICT r1 item 8): under jit+GSPMD all reductions (loss mean,
    gradient sums, BatchNorm batch stats) are global, so mesh sizes 2/4/8
    must reproduce the single-device parameters after an epoch."""
    cfg = preset("simple_pointnet", classes=("chair", "sofa")).replace(
        num_points=128, batch_size=8, epochs=1, optimizer="sgd"
    )
    single = Trainer(cfg, ds)
    single.fit(epochs=1, log_every=0)

    for n in (2, 4, 8):
        mesh = make_mesh(("data",), (n,), jax.devices()[:n])
        dp = Trainer(cfg, ds, mesh=mesh)
        dp.fit(epochs=1, log_every=0)
        _params_equal(single.state.params, dp.state.params, atol=2e-5)
        assert single.history["train"][0] == pytest.approx(
            dp.history["train"][0], abs=1e-5
        ), f"mesh size {n} diverged"
