"""Vmapped per-label protocol (train/ensemble.py).

The exactness contract: per-label runs share config/seed/subset size, so
their PRNG streams and batch orders are identical — vmapping the stacked
models reproduces each label's SEQUENTIAL training. Strict numerical
equality is pinned over one epoch; over many epochs the two paths drift by
reduction-order float noise (batched kernels may accumulate in a different
order than unbatched ones — at any matmul precision), which training
amplifies chaotically, so the multi-epoch run is pinned on protocol
behavior (artifacts, monotone usable histories) rather than bitwise loss.
Unequal label subsets are pinned against sequential runs (padded epochs
must be no-ops via the trainer's empty-step freeze).
"""

import json

import jax
import numpy as np
from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.train import Trainer, preset
from pointcloud_orientation_tpu.train.ensemble import run_per_label_vmapped


def _cfg(**kw):
    return preset("axes_all_labels").replace(
        num_points=128, batch_size=8, **kw)


def _ds():
    return OrientationDataset.synthetic(samples_per_class=10, num_points=160)


LABELS = ("chair", "bottle")


def test_vmapped_L1_matches_sequential_exactly(tmp_path):
    """With one label the vmapped program IS the sequential program — the
    stacking/carry/index mechanics are pinned to float noise. One epoch:
    past the first optimizer step, even 1e-8 param noise can flip a
    near-tied kNN neighbor (discrete selection) and produce an O(1e-3)
    loss jump — the envelope test below covers multi-step closeness."""
    cfg = _cfg(epochs=1)
    ds = _ds()
    label = "chair"
    t = Trainer(cfg.replace(classes=(label,), per_label=False),
                ds.select_classes([label]))
    t.fit(log_every=0)
    res = run_per_label_vmapped(cfg, ds, out_dir=str(tmp_path),
                                labels=[label], log_every=0)
    np.testing.assert_allclose(res[label]["best_val"], t.best_val, rtol=1e-5)
    assert res[label]["best_val_epoch"] == t.best_val_epoch
    np.testing.assert_allclose(
        res[label]["history"]["train"], t.history["train"], rtol=1e-5)
    np.testing.assert_allclose(
        res[label]["history"]["val"], t.history["val"], rtol=1e-5)
    seq_test = t.test()
    np.testing.assert_allclose(
        res[label]["test_loss"], seq_test.mean_loss, rtol=1e-4)


def test_vmapped_no_cross_label_leakage():
    """A label's result must not depend on WHICH label co-trains in the
    other slot (or on slot order) — the definitive isolation pin. (The
    small L>=2-vs-sequential delta is batched-kernel float noise flipping
    near-tied kNN selections — slot-content-independent, shown here.)"""
    cfg = _cfg(epochs=1)
    ds = _ds()
    fwd = run_per_label_vmapped(cfg, ds, labels=["chair", "bottle"],
                                log_every=0)
    rev = run_per_label_vmapped(cfg, ds, labels=["bottle", "chair"],
                                log_every=0)
    dup = run_per_label_vmapped(cfg, ds, labels=["chair", "chair"],
                                log_every=0)
    assert fwd["chair"]["best_val"] == rev["chair"]["best_val"] == \
        dup["chair"]["best_val"]
    assert fwd["bottle"]["best_val"] == rev["bottle"]["best_val"]


def test_vmapped_L2_close_to_sequential():
    """L>=2 batching may flip near-tied kNN neighbors (discrete jumps from
    float noise in the batched distance matmuls); the envelope vs the
    sequential protocol stays within ~1%."""
    cfg = _cfg(epochs=1)
    ds = _ds()
    res = run_per_label_vmapped(cfg, ds, labels=list(LABELS), log_every=0)
    for label in LABELS:
        t = Trainer(cfg.replace(classes=(label,), per_label=False),
                    ds.select_classes([label]))
        t.fit(log_every=0)
        np.testing.assert_allclose(
            res[label]["best_val"], t.best_val, rtol=1e-2)


def test_vmapped_protocol_multi_epoch_artifacts(tmp_path):
    cfg = _cfg(epochs=4)
    res = run_per_label_vmapped(cfg, _ds(), out_dir=str(tmp_path),
                                labels=LABELS, log_every=0)
    for label in LABELS:
        h = res[label]["history"]
        assert len(h["train"]) == len(h["val"]) == 4
        assert np.isfinite(h["train"]).all() and np.isfinite(h["val"]).all()
        assert np.isfinite(res[label]["test_loss"])
        assert 1 <= res[label]["best_val_epoch"] <= 4
        # best_val really is the minimum of the val history
        np.testing.assert_allclose(
            res[label]["best_val"], min(h["val"]), rtol=1e-6)
    # protocol artifacts: summary.txt rows + per-label metrics.json
    summary = (tmp_path / "summary.txt").read_text().strip().splitlines()
    assert [r.split("\t")[0] for r in summary] == list(LABELS)
    m = json.loads((tmp_path / "chair" / "metrics.json").read_text())
    assert len(m["history"]["val"]) == 4 and "test" in m


def _unequal_ds(drop: int = 6):
    """Synthetic set with `drop` fewer chair samples -> unequal subsets
    whose train splits have DIFFERENT batch counts at batch_size=4."""
    ds = OrientationDataset.synthetic(samples_per_class=16, num_points=160)
    keep = np.ones(len(ds), bool)
    chair_rows = np.nonzero(ds.labels == ds.class_names.index("chair"))[0]
    keep[chair_rows[:drop]] = False
    return ds.subset(np.nonzero(keep)[0])


def test_vmapped_unequal_subsets_padding_is_noop():
    """Unbalanced labels (real ModelNet40) pad shorter labels' epochs with
    all-invalid batches made no-ops by the trainer's empty-step freeze.

    The definitive in-situ pin: chair trained in a PADDED slot (mixed with
    the larger bottle subset, nb 2->3 + freeze) must equal chair trained
    with UNPADDED slots (chair-chair dup, no padding, no freeze) —
    observed agreement 9e-8 at epoch 1, 3e-4 at epoch 2 (two different
    compiled programs; pure float noise). The freeze itself is pinned
    bitwise by test_empty_step_freeze_is_exact_noop. vs the sequential
    protocol only a loose envelope holds: at these tiny shapes (batch 4,
    1-2 sample val splits) batched-kernel reduction-order noise flips
    near-tied kNN neighbors and drifts ~1-3% per epoch.
    """
    cfg = preset("axes_all_labels").replace(
        num_points=128, batch_size=4, epochs=2)
    ds = _unequal_ds()
    sizes = {l: len(ds.select_classes([l])) for l in ("chair", "bottle")}
    assert sizes["chair"] != sizes["bottle"]  # the premise
    dup = run_per_label_vmapped(cfg, ds, labels=["chair", "chair"],
                                log_every=0)
    mix = run_per_label_vmapped(cfg, ds, labels=["chair", "bottle"],
                                log_every=0)
    np.testing.assert_allclose(
        mix["chair"]["history"]["val"], dup["chair"]["history"]["val"],
        rtol=1e-2)
    np.testing.assert_allclose(
        mix["chair"]["best_val"], dup["chair"]["best_val"], rtol=1e-2)
    for label in ("chair", "bottle"):
        t = Trainer(cfg.replace(classes=(label,), per_label=False),
                    ds.select_classes([label]))
        t.fit(log_every=0)
        np.testing.assert_allclose(
            mix[label]["best_val"], t.best_val, rtol=2e-1)


def test_vmapped_label_sharded_matches_unsharded():
    """Labels sharded over a 2-device mesh: each chip trains its slice of
    the stacked models with zero collectives — results must match the
    single-device vmapped run (the trainings are independent, so SPMD
    partitioning only splits the label axis)."""
    from pointcloud_orientation_tpu.parallel import make_mesh

    cfg = _cfg(epochs=2)
    ds = _ds()
    base = run_per_label_vmapped(cfg, ds, labels=list(LABELS), log_every=0)
    mesh = make_mesh(("data",), devices=jax.devices()[:2])
    shard = run_per_label_vmapped(cfg, ds, labels=list(LABELS),
                                  log_every=0, mesh=mesh)
    # 1% envelope, not exactness: partitioning the label axis changes the
    # per-device local batch of every kernel, so reductions re-order (the
    # same float-noise class pinned throughout this file; observed 0.17%)
    for label in LABELS:
        np.testing.assert_allclose(
            shard[label]["history"]["val"], base[label]["history"]["val"],
            rtol=1e-2)
        np.testing.assert_allclose(
            shard[label]["test_loss"], base[label]["test_loss"], rtol=1e-2)
    # label count must divide the mesh axis
    import pytest
    with pytest.raises(ValueError, match="divide"):
        run_per_label_vmapped(
            cfg, ds, labels=["chair", "bottle", "sofa"], log_every=0,
            mesh=mesh)


def test_vmapped_angular_masks_undefined_samples():
    """8-dir task: uniform-set classes (bottle) have angular error NaN BY
    DESIGN (tasks.py); the protocol's means must mask those samples — a
    clear-class label stays finite, an all-uniform label is honestly NaN
    (regression for the NaN-poisoning found in multi-seed artifacts)."""
    cfg = preset("8dir_kl").replace(
        num_points=128, batch_size=8, epochs=1, per_label=True,
        classes=("chair", "bottle"))
    ds = _ds()
    res = run_per_label_vmapped(cfg, ds, labels=["chair", "bottle"],
                                log_every=0)
    assert np.isfinite(res["chair"]["test_angular"])
    assert np.all(np.isfinite(res["chair"]["history"]["val_ang"]))
    assert np.isnan(res["bottle"]["test_angular"])


def test_empty_step_freeze_is_exact_noop():
    """An appended all-invalid batch must leave params, optimizer moments
    and step count bitwise unchanged under enable_empty_step_freeze."""
    import jax
    import jax.numpy as jnp

    cfg = _cfg(epochs=1)
    ds = _ds().select_classes(["chair"])
    t = Trainer(cfg.replace(classes=("chair",), per_label=False), ds)
    t.enable_empty_step_freeze()
    res = t._resident(t.train_ds)
    idx, valid = t._epoch_batches(t.train_ds, True, 1)
    pad_i = jnp.concatenate([idx, jnp.zeros((1,) + idx.shape[1:], idx.dtype)])
    pad_v = jnp.concatenate(
        [valid, jnp.zeros((1,) + valid.shape[1:], valid.dtype)])
    key = jax.random.PRNGKey(0)

    def run(im, vm):
        state = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), t.state)
        out, *_ = t._train_epoch(state, res, im, vm, key)
        return out

    a, b = run(idx, valid), run(pad_i, pad_v)
    assert int(a.step) == int(b.step)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        (a.params, a.opt_state, a.batch_stats),
        (b.params, b.opt_state, b.batch_stats))


def test_vmapped_preempt_checkpoint_resume_bit_equal(tmp_path, monkeypatch):
    """Preempt -> protocol checkpoint -> resume must reproduce the
    uninterrupted vmapped run EXACTLY (identical block shapes => identical
    programs; absolute-epoch PRNG streams => identical math)."""
    from pointcloud_orientation_tpu.train import PreemptionGuard

    monkeypatch.setenv("PCOT_EPOCH_BLOCK", "2")
    cfg = _cfg(epochs=4, checkpoint_every=2)
    ds = _ds()

    straight = run_per_label_vmapped(cfg, ds, labels=list(LABELS),
                                     log_every=0)

    guard = PreemptionGuard()
    guard.request()  # fires before the first block boundary
    ck = str(tmp_path / "ck")
    out = run_per_label_vmapped(
        cfg, ds, labels=list(LABELS), log_every=0,
        checkpoint_dir=ck, preemption_guard=guard)
    assert out is None  # incomplete: stopped after epoch 2 and saved

    resumed = run_per_label_vmapped(
        cfg, ds, labels=list(LABELS), log_every=0,
        resume_from=str(tmp_path / "ck" / "step_2"))
    for label in LABELS:
        s, r = straight[label], resumed[label]
        assert r["history"] == s["history"]
        assert r["best_val"] == s["best_val"]
        assert r["best_val_epoch"] == s["best_val_epoch"]
        assert r["test_loss"] == s["test_loss"]
        assert r["test_angular"] == s["test_angular"]


def test_vmapped_preempt_on_final_block_completes(tmp_path, monkeypatch):
    """A preemption that fires during the FINAL block is a completed run:
    every epoch trained, so the protocol must finish its test phase and
    return results (identical to the uninterrupted run) instead of
    returning None and discarding finished work. A checkpoint is still
    saved for the preemption contract."""
    from pointcloud_orientation_tpu.train import PreemptionGuard

    monkeypatch.setenv("PCOT_EPOCH_BLOCK", "2")
    cfg = _cfg(epochs=2)
    ds = _ds()

    straight = run_per_label_vmapped(cfg, ds, labels=list(LABELS),
                                     log_every=0)
    guard = PreemptionGuard()
    guard.request()  # "fires" during the only (= final) block
    ck = str(tmp_path / "ck")
    out = run_per_label_vmapped(
        cfg, ds, labels=list(LABELS), log_every=0,
        checkpoint_dir=ck, preemption_guard=guard)
    assert out is not None
    for label in LABELS:
        assert out[label]["test_loss"] == straight[label]["test_loss"]
        assert out[label]["history"] == straight[label]["history"]
    assert (tmp_path / "ck" / "step_2").is_dir()  # durable state still saved
