"""Von Mises math vs SciPy, plus golden mu-convention cases.

The golden cases reproduce the reference's notebook validation of the yaw
convention (`data_process/2d_single_peak_vM_test.ipynb`, cases A-D).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special as sps
from scipy.optimize import linear_sum_assignment

from pointcloud_orientation_tpu.ops import (
    DIRS_8,
    forward_to_8dir_probs,
    forward_to_mu,
    hungarian_small,
    kl_von_mises,
    matched_mvm_loss,
    mvm_density_on_grid,
    von_mises_pdf,
)


def scipy_kl_vm(mu_p, kp, mu_q, kq):
    kp = np.clip(kp, 1e-6, 500.0)
    kq = np.clip(kq, 1e-6, 500.0)
    a_p = sps.i1(kp) / sps.i0(kp)
    delta = (mu_p - mu_q + math.pi) % (2 * math.pi) - math.pi
    return np.log(sps.i0(kq) / sps.i0(kp)) + a_p * (kp - kq * np.cos(delta))


@pytest.mark.parametrize("kp,kq", [(0.5, 8.0), (8.0, 8.0), (80.0, 1.0), (400.0, 450.0)])
def test_kl_von_mises_vs_scipy(kp, kq):
    mus = np.linspace(-math.pi, math.pi, 13)
    for mu_p in mus[::3]:
        for mu_q in mus[::4]:
            got = float(kl_von_mises(mu_p, kp, mu_q, kq))
            expect = scipy_kl_vm(mu_p, kp, mu_q, kq)
            np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_kl_von_mises_self_zero():
    got = np.asarray(kl_von_mises(jnp.asarray([0.3, -2.0]), jnp.asarray([5.0, 60.0]),
                                  jnp.asarray([0.3, -2.0]), jnp.asarray([5.0, 60.0])))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)


def test_kl_von_mises_large_kappa_finite():
    # the raw-I0 formulation overflows here; the scaled one must not
    got = float(kl_von_mises(0.0, 500.0, 1.0, 500.0))
    assert np.isfinite(got) and got > 0


def test_von_mises_pdf_normalizes():
    theta = np.linspace(-math.pi, math.pi, 20001)
    for kappa in [0.0, 1.0, 8.0, 80.0]:
        p = np.asarray(von_mises_pdf(jnp.asarray(theta), 0.7, kappa))
        integral = np.trapezoid(p, theta)
        np.testing.assert_allclose(integral, 1.0, rtol=1e-3)
    # kappa=0 is the uniform density
    p0 = np.asarray(von_mises_pdf(jnp.asarray(theta), 0.0, 0.0))
    np.testing.assert_allclose(p0, 1.0 / (2 * math.pi), rtol=1e-5)


def test_mvm_density_on_grid_shape_and_norm(rng):
    mu = jnp.asarray(rng.uniform(-math.pi, math.pi, (3, 4)).astype(np.float32))
    kappa = jnp.asarray(rng.uniform(0.5, 20, (3, 4)).astype(np.float32))
    w = jnp.asarray(np.full((3, 4), 0.25, np.float32))
    theta, p = mvm_density_on_grid(mu, kappa, w, num=360)
    assert theta.shape == (359,)
    assert p.shape == (3, 359)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-4)


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_hungarian_matches_scipy(rng, k):
    B = 16
    cost = rng.uniform(0, 10, size=(B, 4, 4)).astype(np.float32)
    ks = np.full((B,), k, np.int32)
    col, total = hungarian_small(jnp.asarray(cost), jnp.asarray(ks))
    col, total = np.asarray(col), np.asarray(total)
    for b in range(B):
        r, c = linear_sum_assignment(cost[b, :k, :k])
        expect = cost[b, :k, :k][r, c].sum()
        np.testing.assert_allclose(total[b], expect, rtol=1e-5)
        got = cost[b][np.arange(k), col[b, :k]].sum()
        np.testing.assert_allclose(got, expect, rtol=1e-5)


def np_match_loss(mu_p, kp, wp, mu_g, kg, K):
    """Independent NumPy model of the reference match_loss semantics
    (`train_multi_peaks_vonMises_KL.py:54-81`)."""
    B = mu_p.shape[0]
    out = np.zeros(B)
    for b in range(B):
        k = int(K[b])
        if k <= 0:
            continue
        cost = np.zeros((k, k))
        for i in range(k):
            for j in range(k):
                cost[i, j] = scipy_kl_vm(mu_p[b, i], kp[b, i], mu_g[b, j], kg[b, j])
        cost = np.nan_to_num(cost, nan=1e6, posinf=1e6, neginf=1e6)
        row, col = linear_sum_assignment(cost)
        ws = wp[b, row]
        out[b] = np.sum(ws * cost[row, col]) / (ws.sum() + 1e-8)
    return out


def test_matched_mvm_loss_vs_numpy(rng):
    B, K = 12, 4
    mu_p = rng.uniform(-math.pi, math.pi, (B, K)).astype(np.float32)
    kp = rng.uniform(0.1, 50, (B, K)).astype(np.float32)
    wp = rng.uniform(0.05, 1.0, (B, K)).astype(np.float32)
    wp = wp / wp.sum(-1, keepdims=True)
    mu_g = rng.uniform(-math.pi, math.pi, (B, K)).astype(np.float32)
    kg = rng.uniform(0.0, 10, (B, K)).astype(np.float32)
    ks = rng.integers(0, 5, (B,)).astype(np.int32)
    got = np.asarray(
        matched_mvm_loss(*(jnp.asarray(a) for a in (mu_p, kp, wp, mu_g, kg, ks)))
    )
    expect = np_match_loss(mu_p, kp, wp, mu_g, kg, ks)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_matched_mvm_loss_weight_collapse_quirk():
    """The reference objective has a degenerate minimum: driving the matched
    mixture weights toward 0 sends the loss to ~0 regardless of the fit
    (``sum(w * cost) / (sum(w) + 1e-8)``, `train_multi_peaks_vonMises_KL.py:
    77-80`). Its own published results show the signature (all K<=1
    categories report exactly 0.0, `results/multi_peak_vonMises_KL/
    results.txt`). We reproduce the objective faithfully, quirk included —
    this test pins the behavior."""
    B, K = 2, 4
    mu_p = jnp.zeros((B, K))
    kappa_p = jnp.ones((B, K))  # badly mismatched vs gt kappa=8
    w_tiny = jnp.full((B, K), 1e-15)
    mu_g = jnp.full((B, K), 1.0)
    kappa_g = jnp.full((B, K), 8.0)
    ks = jnp.asarray([1, 1])
    per = matched_mvm_loss(mu_p, kappa_p, w_tiny, mu_g, kappa_g, ks)
    assert float(jnp.max(per)) < 1e-3  # collapsed weights => ~0 loss
    # sane weights expose the real (large) KL
    w_norm = jnp.full((B, K), 0.25)
    per2 = matched_mvm_loss(mu_p, kappa_p, w_norm, mu_g, kappa_g, ks)
    assert float(jnp.min(per2)) > 1.0


# ---------- 8-direction projection ----------


def test_forward_to_8dir_probs_matches_numpy(rng):
    v = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(forward_to_8dir_probs(jnp.asarray(v)))
    dirs = np.asarray(DIRS_8)
    for i in range(32):
        u = v[i] / (np.linalg.norm(v[i]) + 1e-8)
        sims = np.clip(dirs @ u, 0.0, None)
        expect = np.full(8, 0.125) if sims.sum() == 0 else sims / sims.sum()
        np.testing.assert_allclose(got[i], expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_forward_to_8dir_zero_vector_uniform():
    got = np.asarray(forward_to_8dir_probs(jnp.zeros((1, 3))))
    np.testing.assert_allclose(got[0], 0.125, atol=1e-6)


# ---------- golden mu-convention cases (notebook cases A-D) ----------


def test_mu_case_a_baseline_minus_z():
    assert float(forward_to_mu(jnp.asarray([0.0, 0.0, -1.0]))) == pytest.approx(0.0)


def test_mu_case_b_plus_x_is_90deg():
    assert float(forward_to_mu(jnp.asarray([1.0, 0.0, 0.0]))) == pytest.approx(
        math.pi / 2
    )


def test_mu_case_c_minus_48_55deg():
    ang = math.radians(-48.55)
    fwd = jnp.asarray([math.sin(ang), 0.0, -math.cos(ang)])
    assert float(forward_to_mu(fwd)) == pytest.approx(ang, abs=1e-6)


def test_mu_case_d_near_vertical_fallback():
    fwd = jnp.asarray([1e-12, 1.0, -1e-12])
    assert float(forward_to_mu(fwd)) == pytest.approx(0.0, abs=1e-6)


def test_unmatched_penalty_blocks_weight_collapse():
    """With the framework's unmatched-weight penalty, the collapse exploit
    no longer yields ~0 loss; a well-fit prediction still does."""
    B, K = 2, 4
    mu_g = jnp.full((B, K), 1.0)
    kappa_g = jnp.full((B, K), 8.0)
    ks = jnp.asarray([1, 1])
    # collapsed weights + bad fit: penalized near the full penalty (1.0)
    bad = matched_mvm_loss(
        jnp.zeros((B, K)), jnp.ones((B, K)), jnp.full((B, K), 1e-15),
        mu_g, kappa_g, ks, unmatched_penalty=1.0,
    )
    assert float(jnp.min(bad)) > 0.9
    # confident well-fit prediction: near zero
    good = matched_mvm_loss(
        mu_g, kappa_g, jnp.asarray([[1.0, 0, 0, 0]] * B),
        mu_g, kappa_g, ks, unmatched_penalty=1.0,
    )
    assert float(jnp.max(good)) < 1e-3
    # penalty=0 keeps exact reference parity (collapse -> ~0)
    legacy = matched_mvm_loss(
        jnp.zeros((B, K)), jnp.ones((B, K)), jnp.full((B, K), 1e-15),
        mu_g, kappa_g, ks,
    )
    assert float(jnp.max(legacy)) < 1e-3


def test_inv_bessel_ratio_round_trip():
    """A^{-1}(A(kappa)) == kappa across the useful range (0 .. 500)."""
    import jax.numpy as jnp

    from pointcloud_orientation_tpu.ops.von_mises import (
        bessel_ratio, inv_bessel_ratio,
    )

    kappa = jnp.asarray([0.0, 0.05, 0.5, 1.0, 2.0, 5.0, 20.0, 80.0, 500.0])
    back = inv_bessel_ratio(bessel_ratio(kappa))
    np.testing.assert_allclose(np.asarray(back), np.asarray(kappa),
                               rtol=2e-3, atol=1e-3)


def test_vm_mixture_moment_match_against_grid_integration():
    """mu*, kappa* must reproduce the mixture's first circular moment
    computed by direct numerical integration of the density."""
    import jax.numpy as jnp

    from pointcloud_orientation_tpu.ops.von_mises import (
        bessel_ratio, mixture_von_mises_pdf, vm_mixture_moment_match,
    )

    mu = jnp.asarray([[0.3, -2.5, 1.1]])
    kappa = jnp.asarray([[4.0, 9.0, 2.0]])
    w = jnp.asarray([[0.5, 0.3, 0.2]])

    theta = jnp.linspace(0.0, 2 * np.pi, 20001)[:-1]
    p = mixture_von_mises_pdf(theta[None, :], mu, kappa, w)  # (1, T)
    p = p / p.sum(-1, keepdims=True)
    m_c = float(jnp.sum(p * jnp.cos(theta)))
    m_s = float(jnp.sum(p * jnp.sin(theta)))

    mu_star, kappa_star = vm_mixture_moment_match(mu, kappa, w, axis=-1)
    assert abs(float(mu_star[0]) - np.arctan2(m_s, m_c)) < 1e-4
    r_grid = np.hypot(m_c, m_s)
    r_fit = float(bessel_ratio(kappa_star)[0])
    assert abs(r_fit - r_grid) < 1e-4
