"""Vmapped per-label protocol (train/ensemble.py).

The exactness contract: per-label runs share config/seed/subset size, so
their PRNG streams and batch orders are identical — vmapping the stacked
models reproduces each label's SEQUENTIAL training. Strict numerical
equality is pinned over one epoch; over many epochs the two paths drift by
reduction-order float noise (batched kernels may accumulate in a different
order than unbatched ones — at any matmul precision), which training
amplifies chaotically, so the multi-epoch run is pinned on protocol
behavior (artifacts, monotone usable histories) rather than bitwise loss.
Also pins the equal-size guard.
"""

import json

import jax
import numpy as np
import pytest

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


def test_vmapped_rejects_unequal_subsets():
    cfg = _cfg(epochs=2)
    ds = _ds()
    smaller = ds.select_classes(["chair", "bottle"])
    # drop one sample of the first class -> unequal label sizes
    keep = np.ones(len(smaller), bool)
    keep[np.argmax(smaller.labels == smaller.labels[0])] = False
    unequal = smaller.subset(np.nonzero(keep)[0])
    with pytest.raises(ValueError, match="equal-size"):
        run_per_label_vmapped(cfg, unequal, labels=["chair", "bottle"])
