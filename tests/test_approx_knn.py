"""Opt-in approximate kNN grouping (jax.lax.approx_min_k / PartialReduce).

Default stays exact (reference semantics, `models/base.py:29-35`); these
pin the opt-in path's mechanics: high recall vs exact selection, correct
grouping geometry (every emitted neighbor is a real cloud point, centered
on its centroid), and knob validation/restoration.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.ops import (
    index_points,
    knn_query,
    sample_and_group,
    set_knn_impl,
)


@pytest.fixture(autouse=True)
def _restore_knn_impl():
    yield
    set_knn_impl("exact", recall_target=0.95, approx_min_n=4096)


def _recall(exact: np.ndarray, approx: np.ndarray) -> float:
    B, S, K = exact.shape
    return float(
        np.mean(
            [
                len(set(exact[b, s]) & set(approx[b, s])) / K
                for b in range(B)
                for s in range(S)
            ]
        )
    )


def test_approx_knn_high_recall_vs_exact():
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (2, 512, 3), jnp.float32)
    new_xyz = xyz[:, :64]
    exact = np.asarray(knn_query(new_xyz, xyz, 16))
    set_knn_impl("approx", approx_min_n=1)
    approx = np.asarray(knn_query(new_xyz, xyz, 16))
    # the CPU lowering is exact; the bound keeps the test valid on any
    # backend with a genuinely approximate lowering (TPU measures ~0.98
    # at N=10k, benchmarks/profile_approx_knn.py)
    assert _recall(exact, approx) >= 0.9


def test_approx_knn_recall_knob_validated():
    with pytest.raises(ValueError):
        set_knn_impl("sorta")
    with pytest.raises(ValueError):
        set_knn_impl("approx", recall_target=0.0)
    with pytest.raises(ValueError):
        set_knn_impl("approx", recall_target=1.5)


def test_set_knn_impl_is_atomic_on_failure():
    """A rejected call must not leave half-applied global state — the impl
    must not flip to 'approx' when the recall/threshold arg is invalid."""
    from pointcloud_orientation_tpu.ops import geometry as G

    assert G._KNN_IMPL == "exact"
    with pytest.raises(ValueError):
        set_knn_impl("approx", recall_target=1.5)
    assert G._KNN_IMPL == "exact"
    with pytest.raises(ValueError):
        set_knn_impl("approx", approx_min_n=0)
    assert G._KNN_IMPL == "exact"


def test_approx_sample_and_group_geometry():
    """Every approx-grouped neighbor must be an actual cloud point centered
    on its centroid, and features must ride the same indices as coords."""
    key = jax.random.PRNGKey(1)
    B, N, S, K, D = 2, 256, 32, 8, 5
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, N, D), jnp.float32)

    set_knn_impl("approx", approx_min_n=1)
    new_xyz, grouped = sample_and_group(
        xyz, feats, S, K, sampling="first", grouping="knn"
    )
    assert new_xyz.shape == (B, S, 3)
    assert grouped.shape == (B, S, K, 3 + D)

    # the same trace re-run yields the same indices; reconstruct them
    idx = np.asarray(knn_query(new_xyz, xyz, K))
    want_coords = np.asarray(index_points(xyz, jnp.asarray(idx)))
    want_centered = want_coords - np.asarray(new_xyz)[:, :, None, :]
    np.testing.assert_allclose(
        np.asarray(grouped[..., :3]), want_centered, atol=1e-6
    )
    want_feats = np.asarray(index_points(feats, jnp.asarray(idx)))
    np.testing.assert_allclose(np.asarray(grouped[..., 3:]), want_feats)

    # membership: un-centered neighbors are rows of the cloud (tolerance:
    # (x - c) + c reintroduces one rounding step)
    uncentered = np.asarray(grouped[..., :3]) + np.asarray(new_xyz)[:, :, None, :]
    xyz_np = np.asarray(xyz)
    for b in range(B):
        d = np.min(
            np.sum(
                (uncentered[b].reshape(-1, 1, 3) - xyz_np[b][None]) ** 2, -1
            ),
            axis=1,
        )
        assert np.all(d < 1e-10)


def test_approx_threshold_keeps_small_stages_exact():
    """Under 'approx', stages with fewer than approx_min_n candidates
    dispatch the EXACT path — inside a 10k model the sa2/sa3 stages
    (N=128) stay on the fused kernel and stay exact."""
    key = jax.random.PRNGKey(4)
    xyz = jax.random.normal(key, (1, 512, 3), jnp.float32)
    new_xyz = xyz[:, :32]
    exact = np.asarray(knn_query(new_xyz, xyz, 8))
    set_knn_impl("approx", approx_min_n=4096)  # 512 < threshold
    np.testing.assert_array_equal(
        np.asarray(knn_query(new_xyz, xyz, 8)), exact)
    with pytest.raises(ValueError):
        set_knn_impl("approx", approx_min_n=0)


def test_env_knob_validated_at_import():
    """A PCOT_KNN typo must fail loudly at import, not silently run the
    exact path under an 'approx' banner (review finding r3s4)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import pointcloud_orientation_tpu.ops.geometry"],
        env={**os.environ, "PCOT_KNN": "Approx", "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True,
    )
    assert r.returncode != 0 and "bad knn impl" in r.stderr
    r = subprocess.run(
        [sys.executable, "-c",
         "import pointcloud_orientation_tpu.ops.geometry"],
        env={**os.environ, "PCOT_KNN": "approx",
             "PCOT_KNN_RECALL": "1.5", "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True,
    )
    assert r.returncode != 0 and "bad recall_target" in r.stderr


def test_exact_default_unchanged_by_knob_roundtrip():
    key = jax.random.PRNGKey(3)
    xyz = jax.random.normal(key, (1, 300, 3), jnp.float32)
    new_xyz = xyz[:, :16]
    before = np.asarray(knn_query(new_xyz, xyz, 8))
    set_knn_impl("approx", approx_min_n=1)
    set_knn_impl("exact")
    after = np.asarray(knn_query(new_xyz, xyz, 8))
    np.testing.assert_array_equal(before, after)


# ---------------------------------------------------------------------------
# Grid-pruned EXACT kNN ("grid" impl): pruning must never change results
# ---------------------------------------------------------------------------


def _knn_sets_equal(a: np.ndarray, b: np.ndarray):
    """Index SETS must match per (batch, centroid) — within-K order can
    legally differ between formulations only on exact distance ties, so
    compare the selected sets and their sorted distances instead."""
    B, S, K = a.shape
    for bb in range(B):
        for s in range(S):
            assert set(a[bb, s].tolist()) == set(b[bb, s].tolist()), (bb, s)


def test_grid_knn_equals_exact():
    from pointcloud_orientation_tpu.ops import geometry as G

    key = jax.random.PRNGKey(1)
    # mix of cluster + uniform so cells are unevenly filled
    xyz = jnp.concatenate(
        [jax.random.normal(key, (2, 4096, 3)) * 0.2,
         jax.random.uniform(jax.random.fold_in(key, 1), (2, 4096, 3),
                            minval=-1, maxval=1)], axis=1)
    new_xyz = xyz[:, ::16][:, :128]
    exact = np.asarray(knn_query(new_xyz, xyz, 32))
    set_knn_impl("grid", approx_min_n=1)
    grid = np.asarray(knn_query(new_xyz, xyz, 32))
    _knn_sets_equal(exact, grid)


def test_grid_knn_fallback_when_budget_overflows(monkeypatch):
    """Tiny M forces cube overflow -> the certificate fails -> the batch
    falls back to the full exact path; results still exact."""
    from pointcloud_orientation_tpu.ops import geometry as G

    monkeypatch.setattr(G, "_KNN_GRID_M", 8)  # << K: guaranteed fallback
    key = jax.random.PRNGKey(2)
    xyz = jax.random.normal(key, (2, 2048, 3), jnp.float32)
    new_xyz = xyz[:, :64]
    exact = np.asarray(G._exact_full_knn(new_xyz, xyz, 16))
    grid = np.asarray(G._grid_pruned_knn(new_xyz, xyz, 16))
    _knn_sets_equal(exact, grid)


def test_grid_knn_certificate_fallback_on_adversarial_cloud(monkeypatch):
    """A cloud whose kNN radius exceeds the cell size (two far clusters,
    sparse interior) must certify-or-fallback, never silently truncate."""
    from pointcloud_orientation_tpu.ops import geometry as G

    rng = np.random.default_rng(0)
    # 16 points spread over a huge box + dense far clusters: K=12 of 16 near
    # points forces neighbors beyond the r=1 cube for most centroids
    a = rng.uniform(-100, 100, size=(1, 512, 3)).astype(np.float32)
    xyz = jnp.asarray(a)
    new_xyz = xyz[:, :32]
    exact = np.asarray(G._exact_full_knn(new_xyz, xyz, 12))
    grid = np.asarray(G._grid_pruned_knn(new_xyz, xyz, 12))
    _knn_sets_equal(exact, grid)


def test_grid_sample_and_group_matches_exact():
    """Dispatch-level: sample_and_group under 'grid' returns the same
    grouped geometry as the exact path (deterministic sampling)."""
    key = jax.random.PRNGKey(3)
    xyz = jax.random.normal(key, (2, 4096, 3), jnp.float32)
    nx_e, ge = sample_and_group(xyz, None, 64, 16, sampling="first")
    set_knn_impl("grid", approx_min_n=1)
    nx_g, gg = sample_and_group(xyz, None, 64, 16, sampling="first")
    np.testing.assert_allclose(np.asarray(nx_e), np.asarray(nx_g), atol=0)
    # neighbor sets equal => sorted per-centroid neighbor coords equal
    se = np.sort(np.asarray(ge).reshape(2, 64, 16, 3), axis=2)
    sg = np.sort(np.asarray(gg).reshape(2, 64, 16, 3), axis=2)
    np.testing.assert_allclose(se, sg, atol=0)


def test_pallas_gate_bounded_by_vmem_ceiling(monkeypatch):
    """The fused (S, N)-tile kernels have a MEASURED compile ceiling on v5e
    (`benchmarks/probe_pallas_bounds.py`: knn_pallas ok at N=20,480, Mosaic
    register-spill FAILURE at 24,576). The dispatch gate must route
    larger-N shapes to the XLA matmul+top_k path instead of crashing the
    compile — and FPS, whose VMEM is linear in N, must NOT inherit the
    tile ceiling."""
    from pointcloud_orientation_tpu.ops import geometry as G

    monkeypatch.setattr(G.jax, "default_backend", lambda: "tpu")
    assert not G._pallas_eligible(512)  # floor unchanged
    assert G._pallas_eligible(1024)
    assert G._pallas_eligible(G._PALLAS_KNN_MAX_N)
    assert not G._pallas_eligible(G._PALLAS_KNN_MAX_N + 1)
    assert not G._pallas_eligible(32_768)
    # 'always' (interpret-mode tests) bypasses the bound deliberately
    monkeypatch.setattr(G, "_PALLAS_MODE", "always")
    assert G._pallas_eligible(32_768)


def test_knn_beyond_pallas_ceiling_stays_exact(monkeypatch):
    """Above the ceiling the XLA fallback must produce exact kNN (same
    distance multiset as brute force) — correctness of the reroute, shape
    kept small by lowering the ceiling instead of allocating 24k points."""
    from pointcloud_orientation_tpu.ops import geometry as G

    monkeypatch.setattr(G, "_PALLAS_KNN_MAX_N", 512)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (2, 1024, 3))  # now "beyond the ceiling"
    new_xyz = xyz[:, :64]
    idx = knn_query(new_xyz, xyz, 8)
    d = jnp.sum((new_xyz[:, :, None] - xyz[:, None]) ** 2, -1)
    ref = jnp.sort(d, -1)[..., :8]
    got = jnp.sort(
        jnp.take_along_axis(d, idx, -1), -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
