"""Pallas kernels vs the pure-jnp reference ops (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.ops import farthest_point_sample, knn_query
from pointcloud_orientation_tpu.ops.geometry import set_pallas_mode
from pointcloud_orientation_tpu.ops.pallas_kernels import fps_pallas, knn_pallas


def test_fps_pallas_matches_jnp(rng):
    xyz = jnp.asarray(rng.normal(size=(3, 128, 3)).astype(np.float32))
    ref = np.asarray(farthest_point_sample(xyz, 16))
    got = np.asarray(fps_pallas(xyz, 16, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fps_pallas_with_seeds(rng):
    xyz = jnp.asarray(rng.normal(size=(2, 96, 3)).astype(np.float32))
    seeds = jnp.asarray([5, 41], jnp.int32)
    got = np.asarray(fps_pallas(xyz, 8, seeds=seeds, interpret=True))
    assert got[0, 0] == 5 and got[1, 0] == 41
    key = jax.random.PRNGKey(0)
    # same greedy-selection invariant as the jnp version
    xyz_np = np.asarray(xyz)
    for b in range(2):
        chosen = [got[b, 0]]
        for i in range(1, 8):
            d = np.min(
                np.stack([np.sum((xyz_np[b] - xyz_np[b][c]) ** 2, -1) for c in chosen]),
                axis=0,
            )
            assert got[b, i] == np.argmax(d)
            chosen.append(got[b, i])


def test_knn_pallas_matches_jnp(rng):
    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    new_xyz = xyz[:, :24]
    ref = np.asarray(knn_query(new_xyz, xyz, 8))
    got = np.asarray(knn_pallas(new_xyz, xyz, 8, interpret=True))
    for b in range(2):
        for s in range(24):
            assert set(ref[b, s].tolist()) == set(got[b, s].tolist())
    # pallas orders nearest-first deterministically
    d = np.sum((np.asarray(new_xyz)[:, :, None] - np.asarray(xyz)[:, None]) ** 2, -1)
    for b in range(2):
        for s in range(0, 24, 7):
            dists = d[b, s][got[b, s]]
            assert np.all(np.diff(dists) >= -1e-6)


def test_ball_query_pallas_matches_jnp(rng):
    from pointcloud_orientation_tpu.ops import ball_query
    from pointcloud_orientation_tpu.ops.pallas_kernels import ball_query_pallas

    xyz = jnp.asarray(rng.uniform(-1, 1, size=(2, 128, 3)).astype(np.float32))
    new_xyz = xyz[:, :16]
    ref = np.asarray(ball_query(0.5, 8, xyz, new_xyz))
    got = np.asarray(ball_query_pallas(0.5, 8, xyz, new_xyz, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_ball_query_pallas_empty_radius(rng):
    from pointcloud_orientation_tpu.ops import ball_query
    from pointcloud_orientation_tpu.ops.pallas_kernels import ball_query_pallas

    xyz = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 3)).astype(np.float32))
    new_xyz = jnp.asarray([[[50.0, 50.0, 50.0]]])  # no point within radius
    ref = np.asarray(ball_query(0.1, 4, xyz, new_xyz))
    got = np.asarray(ball_query_pallas(0.1, 4, xyz, new_xyz, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_dispatch_mode_switch(rng):
    """'always' routes through the kernels even on CPU (interpret)."""
    xyz = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    new_xyz = xyz[:, :8]
    base = np.asarray(knn_query(new_xyz, xyz, 4))
    set_pallas_mode("always")
    try:
        via_pallas = np.asarray(knn_query(new_xyz, xyz, 4))
    finally:
        set_pallas_mode("auto")
    for b in range(2):
        for s in range(8):
            assert set(base[b, s].tolist()) == set(via_pallas[b, s].tolist())


def test_sample_and_group_fused_path_matches(rng):
    """'always' mode routes sample_and_group's coordinate grouping through
    the fused kernel; output must equal the two-step path."""
    from pointcloud_orientation_tpu.ops import geometry as G

    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    ref_xyz, ref_grouped = G.sample_and_group(xyz, None, 16, 8, key=key)
    G.set_pallas_mode("always")
    try:
        got_xyz, got_grouped = G.sample_and_group(xyz, None, 16, 8, key=key)
    finally:
        G.set_pallas_mode("auto")
    np.testing.assert_allclose(np.asarray(got_xyz), np.asarray(ref_xyz), atol=1e-6)
    # neighbor sets may be ordered differently; compare sorted per group
    a = np.sort(np.asarray(ref_grouped), axis=2)
    b = np.sort(np.asarray(got_grouped), axis=2)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sa_group_coords_pallas_matches(rng):
    from pointcloud_orientation_tpu.ops import index_points, knn_query
    from pointcloud_orientation_tpu.ops.pallas_kernels import sa_group_coords_pallas

    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    cidx = jnp.asarray(rng.choice(256, size=(2, 24), replace=False).astype(np.int32))
    new_xyz, grouped, idx = sa_group_coords_pallas(xyz, cidx, 8, interpret=True)

    ref_new = index_points(xyz, cidx)
    np.testing.assert_allclose(np.asarray(new_xyz), np.asarray(ref_new), atol=1e-6)
    ref_idx = np.asarray(knn_query(ref_new, xyz, 8))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    expect = index_points(xyz, jnp.asarray(ref_idx)) - ref_new[:, :, None, :]
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(expect), atol=1e-5)


def test_sa_group_deferred_equals_interleaved(rng):
    """PCOT_SA_DEFER=1 (default, deferred one-shot extraction) and =0
    (per-pass interleaved extraction) are exactly interchangeable."""
    import os

    from pointcloud_orientation_tpu.ops.pallas_kernels import sa_group_coords_pallas

    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    # duplicated points force exact distance ties through both paths
    xyz = xyz.at[:, 100].set(xyz[:, 50])
    cidx = jnp.asarray(rng.choice(256, size=(2, 24), replace=False).astype(np.int32))

    prev = os.environ.get("PCOT_SA_DEFER")
    try:
        os.environ["PCOT_SA_DEFER"] = "1"
        out_d = sa_group_coords_pallas(xyz, cidx, 8, interpret=True)
        jax.clear_caches()  # kernels capture the env at trace time
        os.environ["PCOT_SA_DEFER"] = "0"
        out_i = sa_group_coords_pallas(xyz, cidx, 8, interpret=True)
    finally:
        if prev is None:
            os.environ.pop("PCOT_SA_DEFER", None)
        else:
            os.environ["PCOT_SA_DEFER"] = prev
        jax.clear_caches()
    for a, b in zip(out_d, out_i):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sa_group_feats_pallas_matches_and_grads(rng):
    from pointcloud_orientation_tpu.ops import index_points, knn_query
    from pointcloud_orientation_tpu.ops.pallas_kernels import sa_group_feats_pallas

    B, N, D, S, K = 2, 96, 16, 12, 8
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    cidx = jnp.asarray(
        np.stack([rng.choice(N, size=S, replace=False) for _ in range(B)]).astype(
            np.int32
        )
    )
    new_xyz, grouped, idx = sa_group_feats_pallas(xyz, feats, cidx, K, True)

    ref_new = index_points(xyz, cidx)
    ref_idx = knn_query(ref_new, xyz, K)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    ref_coords = index_points(xyz, ref_idx) - ref_new[:, :, None, :]
    ref_feats = index_points(feats, ref_idx)
    np.testing.assert_allclose(
        np.asarray(grouped[..., :3]), np.asarray(ref_coords), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grouped[..., 3:]), np.asarray(ref_feats), atol=1e-6
    )

    # feature-gather VJP == autodiff of the XLA gather
    def loss_pallas(f):
        _, g, _ = sa_group_feats_pallas(xyz, f, cidx, K, True)
        return jnp.sum(g[..., 3:] ** 3)

    def loss_ref(f):
        g = index_points(f, ref_idx)
        return jnp.sum(g**3)

    gp = jax.grad(loss_pallas)(feats)
    gr = jax.grad(loss_ref)(feats)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-5, atol=1e-5)


def test_sample_and_group_fused_feats_path_matches(rng):
    """'always' mode routes the feature-bearing (sa2-style) grouping through
    the fused kernel; output must equal the two-step XLA path."""
    from pointcloud_orientation_tpu.ops import geometry as G

    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(2, 128, 32)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    ref_xyz, ref_grouped = G.sample_and_group(xyz, pts, 16, 8, key=key)
    G.set_pallas_mode("always")
    try:
        got_xyz, got_grouped = G.sample_and_group(xyz, pts, 16, 8, key=key)
    finally:
        G.set_pallas_mode("auto")
    np.testing.assert_allclose(np.asarray(got_xyz), np.asarray(ref_xyz), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_grouped), np.asarray(ref_grouped), atol=1e-5
    )


def test_sa_mlp_max_pallas_matches_and_grads(rng):
    """Fused shared-MLP+max kernel vs jnp reference, values and all grads."""
    from pointcloud_orientation_tpu.ops.pallas_kernels import sa_mlp_max_pallas

    B, K, S, C = 3, 8, 16, 7
    chans = [12, 10, 20]
    g = jnp.asarray(rng.normal(size=(B, K, S, C)).astype(np.float32))
    layers, cin = [], C
    for c in chans:
        layers.append(
            (
                jnp.asarray(rng.normal(size=(cin, c)).astype(np.float32) * 0.3),
                jnp.asarray(rng.uniform(0.5, 1.5, size=c).astype(np.float32)),
                jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1),
            )
        )
        cin = c

    def ref(g, layers):
        x = g
        for w, s, t in layers:
            x = jnp.maximum(
                jnp.einsum(
                    "bksc,cd->bksd", x, w, precision=jax.lax.Precision.HIGHEST
                )
                * s
                + t,
                0.0,
            )
        return jnp.max(x, axis=1)

    out_ref = ref(g, layers)
    out_pal = sa_mlp_max_pallas(g, layers, False, True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), atol=1e-5)

    gr = jax.grad(lambda g, l: jnp.sum(jnp.sin(ref(g, l))), argnums=(0, 1))(g, layers)
    gp = jax.grad(
        lambda g, l: jnp.sum(jnp.sin(sa_mlp_max_pallas(g, l, False, True))),
        argnums=(0, 1),
    )(g, layers)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-4)
    for lr, lp in zip(gr[1], gp[1]):
        for a, b in zip(lr, lp):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-3
            )


def test_shared_mlp_fused_max_matches_unfused(rng):
    """SharedMLP(fuse_max=True, ghost_stride=1): same params -> same pooled
    output, running-stats updates, and param grads as the unfused module
    (train mode; eval must be bitwise-equal via the running-stats fold)."""
    from pointcloud_orientation_tpu.models.layers import SharedMLP

    B, K, S, C = 4, 8, 16, 7
    g_km = jnp.asarray(rng.normal(size=(B, K, S, C)).astype(np.float32))
    g_sk = jnp.swapaxes(g_km, 1, 2)
    unfused = SharedMLP((12, 10, 20))
    fused = SharedMLP((12, 10, 20), fuse_max=True, ghost_stride=1)
    v = unfused.init({"params": jax.random.PRNGKey(0)}, g_sk[:, :, :1])

    out_u, mut_u = unfused.apply(v, g_sk, train=True, mutable=["batch_stats"])
    out_f, mut_f = fused.apply(v, g_km, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(jnp.max(out_u, axis=2)), np.asarray(out_f), atol=1e-5
    )
    for i in range(3):
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_f["batch_stats"][f"BatchNorm_{i}"][k]),
                np.asarray(mut_u["batch_stats"][f"BatchNorm_{i}"][k]),
                atol=1e-6,
            )

    out_ue = jnp.max(unfused.apply(v, g_sk, train=False), axis=2)
    out_fe = fused.apply(v, g_km, train=False)
    np.testing.assert_array_equal(np.asarray(out_ue), np.asarray(out_fe))

    def loss_u(p):
        o, _ = unfused.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            g_sk,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(jnp.sin(jnp.max(o, axis=2)))

    def loss_f(p):
        o, _ = fused.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            g_km,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(jnp.sin(o))

    gu = jax.grad(loss_u)(v["params"])
    gf = jax.grad(loss_f)(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4
        ),
        gu,
        gf,
    )


def test_set_abstraction_fused_mlp_eval_matches(rng):
    """'always' mode routes SetAbstraction through fused grouping AND the
    fused MLP+max kernel; eval output must equal the pure-XLA path (the
    running-stats fold is exact)."""
    from pointcloud_orientation_tpu.models.layers import SetAbstraction
    from pointcloud_orientation_tpu.ops import geometry as G

    xyz = jnp.asarray(rng.normal(size=(3, 64, 3)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(3, 64, 6)).astype(np.float32))
    for sa in (
        SetAbstraction(16, 8, (12, 10, 20)),
        SetAbstraction(None, None, (8, 8, 16), group_all=True),
    ):
        v = sa.init({"params": jax.random.PRNGKey(0)}, xyz, pts)
        ref_xyz, ref_pool = sa.apply(v, xyz, pts)
        G.set_pallas_mode("always")
        try:
            got_xyz, got_pool = sa.apply(v, xyz, pts)
        finally:
            G.set_pallas_mode("auto")
        np.testing.assert_array_equal(np.asarray(ref_xyz), np.asarray(got_xyz))
        np.testing.assert_allclose(
            np.asarray(got_pool), np.asarray(ref_pool), atol=1e-6
        )


def test_kernel_shape_fuzz(rng):
    """Randomized small-shape sweep: every grouping kernel matches the jnp
    reference at non-canonical shapes (odd S/K, N not a power of two,
    feature widths off the 128-lane grid)."""
    from pointcloud_orientation_tpu.ops import index_points, knn_query
    from pointcloud_orientation_tpu.ops.pallas_kernels import (
        fps_pallas,
        knn_pallas,
        sa_group_coords_pallas,
        sa_group_feats_pallas,
    )
    from pointcloud_orientation_tpu.ops.geometry import farthest_point_sample
    from pointcloud_orientation_tpu.ops import geometry as G

    cases = [
        # (B, N, S, K, D)
        (1, 96, 7, 3, 5),
        (2, 130, 24, 9, 1),
        (3, 200, 13, 13, 12),
        (2, 257, 40, 17, 33),
    ]
    for B, N, S, K, D in cases:
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        cidx = jnp.asarray(
            np.stack([rng.choice(N, size=S, replace=False) for _ in range(B)])
            .astype(np.int32)
        )
        tag = f"B{B} N{N} S{S} K{K} D{D}"
        new_xyz = index_points(xyz, cidx)
        ref_idx = np.asarray(knn_query(new_xyz, xyz, K))

        got = np.asarray(knn_pallas(new_xyz, xyz, K, interpret=True))
        np.testing.assert_array_equal(got, ref_idx, err_msg=f"knn {tag}")

        nx, grouped, idx = sa_group_coords_pallas(xyz, cidx, K, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx,
                                      err_msg=f"sa_group idx {tag}")
        expect = index_points(xyz, jnp.asarray(ref_idx)) - new_xyz[:, :, None, :]
        np.testing.assert_allclose(np.asarray(grouped), np.asarray(expect),
                                   atol=1e-5, err_msg=f"sa_group {tag}")

        feats = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        _, gf, idx2 = sa_group_feats_pallas(xyz, feats, cidx, K, True)
        np.testing.assert_array_equal(np.asarray(idx2), ref_idx,
                                      err_msg=f"sa_feats idx {tag}")
        ef = jnp.concatenate(
            [expect, index_points(feats, jnp.asarray(ref_idx))], axis=-1)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ef), atol=1e-5,
                                   err_msg=f"sa_feats {tag}")

        # FPS: compare against the jnp fori_loop formulation
        G.set_pallas_mode("never")
        try:
            ref_fps = np.asarray(farthest_point_sample(xyz, S))
        finally:
            G.set_pallas_mode("auto")
        got_fps = np.asarray(fps_pallas(xyz, S, interpret=True))
        np.testing.assert_array_equal(got_fps, ref_fps, err_msg=f"fps {tag}")


def test_sa_select_variants_exact(rng, monkeypatch):
    """Every PCOT_SA_SELECT formulation (the benchmarking knob on the fused
    grouping kernel's selection loop) picks the IDENTICAL nearest-first
    indices with first-occurrence tie-breaks — including on data with exact
    distance ties. The env var binds at trace time, so each variant gets a
    fresh trace via jax.clear_caches()."""
    import importlib

    from pointcloud_orientation_tpu.ops import pallas_kernels as pk

    pts = rng.normal(size=(2, 256, 3)).astype(np.float32)
    pts[0, 64:96] = pts[0, 0:32]  # exact duplicate points => distance ties
    xyz = jnp.asarray(pts)
    cidx = jnp.asarray(rng.integers(0, 256, size=(2, 40)).astype(np.int32))

    outs = {}
    for sel in ["argmin", "multi2", "multi4", "chunk"]:
        monkeypatch.setenv("PCOT_SA_SELECT", sel)
        jax.clear_caches()
        importlib.reload(pk)
        nx, g, idx = pk.sa_group_coords_pallas(xyz, cidx, 16, interpret=True)
        outs[sel] = (np.asarray(nx), np.asarray(g), np.asarray(idx))
    monkeypatch.delenv("PCOT_SA_SELECT")
    jax.clear_caches()
    importlib.reload(pk)

    ref = outs["argmin"]
    for sel in ["multi2", "multi4", "chunk"]:
        for a, b, name in zip(ref, outs[sel], ["new_xyz", "grouped", "idx"]):
            assert np.array_equal(a, b), (sel, name)
