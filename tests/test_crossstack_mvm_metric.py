"""Pins the matched-MvM shared metric in `benchmarks/cross_stack.py`:

* ``rect=False`` is reference-faithful — it truncates predictions to the
  first ``k`` components (`/root/reference/train_multi_peaks_vonMises_KL.py:55-81`),
  so a better component parked beyond slot ``k`` is invisible;
* ``rect=True`` lets all P components compete (needed to score TTA
  mixtures, where slots ``:k`` are exactly the view-0 prediction);
* exact-duplicate components (a perfectly yaw-equivariant model under
  TTA) leave the rect score unchanged — the honest-neutral case.
"""
import os
import sys

import numpy as np
import pytest

pytest.importorskip("scipy")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from cross_stack import _metrics_mvm  # noqa: E402


def _case():
    # one sample, k=1 gt peak at 0 rad (kappa 8); P=3 predicted components:
    # slot 0 is bad (mu=2.0), slot 2 is near-perfect (mu=0.05)
    mu = np.array([[2.0, 2.5, 0.05]])
    kappa = np.array([[8.0, 8.0, 8.0]])
    w = np.array([[0.4, 0.3, 0.3]])
    gt_params = np.array([[[0.0, 8.0], [0.0, 0.0], [0.0, 0.0]]])
    gt_k = np.array([1])
    return mu, kappa, w, gt_params, gt_k


def test_square_truncates_rect_competes():
    mu, kappa, w, gt, gk = _case()
    sq, _ = _metrics_mvm(mu, kappa, w, gt, gk)          # sees only slot 0
    rc, ang = _metrics_mvm(mu, kappa, w, gt, gk, rect=True)
    assert rc[0] < sq[0] * 0.2          # rect finds the near-perfect slot 2
    assert ang[0] < 5.0                 # matched peak error ~2.9 deg


def test_duplicated_components_are_rect_neutral():
    mu, kappa, w, gt, gk = _case()
    base, _ = _metrics_mvm(mu, kappa, w, gt, gk, rect=True)
    # V=2 exact-equivariance TTA: components duplicated, weights halved
    mu2 = np.concatenate([mu, mu], axis=1)
    kp2 = np.concatenate([kappa, kappa], axis=1)
    w2 = np.concatenate([w, w], axis=1) / 2.0
    dup, _ = _metrics_mvm(mu2, kp2, w2, gt, gk, rect=True)
    assert abs(dup[0] - base[0]) < 1e-9


def test_k0_uniform_stays_nan_zero():
    mu, kappa, w, gt, _ = _case()
    losses, angs = _metrics_mvm(mu, kappa, w, gt, np.array([0]), rect=True)
    assert losses[0] == 0.0 and np.isnan(angs[0])


def test_grid_kl_properties():
    """The assignment-free density metric: zero for a perfect prediction,
    invariant to TTA duplication (the density is unchanged), positive for
    a misplaced peak, and well-defined at k=0 (uniform gt)."""
    from cross_stack import _metrics_mvm_grid

    gt = np.array([[[0.0, 8.0, 0.6], [np.pi, 4.0, 0.4], [0, 0, 0]]])
    gk = np.array([2])
    mu = np.array([[0.0, np.pi, 0.0]])
    kp = np.array([[8.0, 4.0, 0.0]])
    w = np.array([[0.6, 0.4, 0.0]])
    perfect = _metrics_mvm_grid(mu, kp, w, gt, gk)
    assert perfect[0] < 1e-6

    # V=2 duplicate mixture: identical density => identical KL
    mu2 = np.concatenate([mu, mu], 1)
    kp2 = np.concatenate([kp, kp], 1)
    w2 = np.concatenate([w, w], 1) / 2
    dup = _metrics_mvm_grid(mu2, kp2, w2, gt, gk)
    assert abs(dup[0] - perfect[0]) < 1e-9

    # misplaced peak -> clearly positive
    bad = _metrics_mvm_grid(mu + 1.0, kp, w, gt, gk)
    assert bad[0] > 0.5

    # k=0: uniform gt vs (kappa=0) uniform prediction -> ~0
    uni = _metrics_mvm_grid(
        np.zeros((1, 3)), np.zeros((1, 3)),
        np.array([[1.0, 0.0, 0.0]]), np.zeros((1, 3, 3)), np.array([0]))
    assert uni[0] < 1e-9
