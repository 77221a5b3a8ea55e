"""Unit tests for ops.geometry against independent NumPy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.ops import geometry as G


def np_square_distance(src, dst):
    return np.sum((src[:, :, None, :] - dst[:, None, :, :]) ** 2, axis=-1)


def test_index_points_2d(rng):
    pts = rng.normal(size=(4, 50, 3)).astype(np.float32)
    idx = rng.integers(0, 50, size=(4, 7))
    out = G.index_points(jnp.asarray(pts), jnp.asarray(idx))
    expect = np.stack([pts[b][idx[b]] for b in range(4)])
    np.testing.assert_allclose(np.asarray(out), expect)


def test_index_points_3d(rng):
    pts = rng.normal(size=(2, 30, 5)).astype(np.float32)
    idx = rng.integers(0, 30, size=(2, 6, 4))
    out = G.index_points(jnp.asarray(pts), jnp.asarray(idx))
    expect = np.stack([pts[b][idx[b]] for b in range(2)])
    assert out.shape == (2, 6, 4, 5)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_square_distance(rng):
    src = rng.normal(size=(3, 20, 3)).astype(np.float32)
    dst = rng.normal(size=(3, 15, 3)).astype(np.float32)
    out = G.square_distance(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(
        np.asarray(out), np_square_distance(src, dst), rtol=1e-4, atol=1e-4
    )


def test_knn_query_matches_bruteforce(rng):
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    new_xyz = rng.normal(size=(2, 9, 3)).astype(np.float32)
    k = 5
    idx = np.asarray(G.knn_query(jnp.asarray(new_xyz), jnp.asarray(xyz), k))
    d = np_square_distance(new_xyz, xyz)
    for b in range(2):
        for s in range(9):
            expect = set(np.argsort(d[b, s])[:k].tolist())
            assert set(idx[b, s].tolist()) == expect


def np_ball_query(radius, nsample, xyz, new_xyz):
    """Independent NumPy model of the reference's radius query semantics:
    within-radius points by ascending index, pad with the first."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    out = np.zeros((B, S, nsample), dtype=np.int64)
    d = np_square_distance(new_xyz, xyz)
    for b in range(B):
        for s in range(S):
            inside = np.where(d[b, s] <= radius**2)[0]
            if len(inside) == 0:
                out[b, s] = 0
            elif len(inside) >= nsample:
                out[b, s] = inside[:nsample]
            else:
                padded = np.full(nsample, inside[0])
                padded[: len(inside)] = inside
                out[b, s] = padded
    return out


def test_ball_query_matches_reference_semantics(rng):
    xyz = rng.uniform(-1, 1, size=(2, 40, 3)).astype(np.float32)
    new_xyz = xyz[:, :6, :]
    radius, nsample = 0.5, 8
    got = np.asarray(G.ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    expect = np_ball_query(radius, nsample, xyz, new_xyz)
    np.testing.assert_array_equal(got, expect)


def test_fps_greedy_property(rng):
    """Each selected point must be the argmax of min-distance to the
    previously selected set (the FPS invariant)."""
    xyz = rng.normal(size=(2, 32, 3)).astype(np.float32)
    npoint = 6
    idx = np.asarray(G.farthest_point_sample(jnp.asarray(xyz), npoint))
    for b in range(2):
        assert idx[b, 0] == 0  # deterministic start when no key given
        chosen = [idx[b, 0]]
        for i in range(1, npoint):
            d = np.min(
                np.stack(
                    [np.sum((xyz[b] - xyz[b][c]) ** 2, axis=-1) for c in chosen]
                ),
                axis=0,
            )
            assert idx[b, i] == np.argmax(d)
            chosen.append(idx[b, i])


def test_fps_unique_indices(rng):
    xyz = rng.normal(size=(3, 64, 3)).astype(np.float32)
    idx = np.asarray(
        G.farthest_point_sample(jnp.asarray(xyz), 16, key=jax.random.PRNGKey(0))
    )
    for b in range(3):
        assert len(set(idx[b].tolist())) == 16


def test_random_sample_indices_distinct():
    idx = np.asarray(G.random_sample_indices(jax.random.PRNGKey(1), 4, 100, 32))
    assert idx.shape == (4, 32)
    for b in range(4):
        assert len(set(idx[b].tolist())) == 32
        assert idx[b].min() >= 0 and idx[b].max() < 100


def test_sample_and_group_shapes(rng):
    xyz = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    new_xyz, grouped = G.sample_and_group(xyz, feats, 8, 4, key=key)
    assert new_xyz.shape == (2, 8, 3)
    assert grouped.shape == (2, 8, 4, 19)
    # centered coordinates: each group's first-3 channels should have small
    # magnitude relative to the cloud scale when grouping nearest neighbors
    assert np.asarray(jnp.abs(grouped[..., :3]).max()) < np.asarray(
        jnp.abs(xyz).max() * 2.5
    )


def test_group_all_shapes(rng):
    xyz = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    new_xyz, grouped = G.group_all(xyz, feats)
    assert new_xyz.shape == (2, 1, 3)
    assert grouped.shape == (2, 1, 10, 7)
    np.testing.assert_allclose(np.asarray(grouped[..., :3]), np.asarray(xyz)[:, None])
