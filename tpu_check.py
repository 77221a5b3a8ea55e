"""On-device Pallas parity check: asserts every TPU kernel's output equals
the pure-jnp reference ON THE REAL CHIP (Mosaic compile != Mosaic correct;
the interpret-mode tests in tests/test_pallas_kernels.py cannot see
device-side miscompiles). Run: python tpu_check.py   (exit 0 = all equal).

VERDICT r1 item 6. Canonical shapes: the SA-stage shapes of the PointNet++
trunk (`models/pointnet_pp.py:48-57`) at B=8, plus a large-N case.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, exact=True, atol=0.0, rtol=0.0):
    got, want = np.asarray(got), np.asarray(want)
    if exact:
        ok = np.array_equal(got, want)
    else:
        ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"{'PASS' if ok else 'FAIL'}  {name}")
    if not ok:
        mism = np.sum(got != want) if exact else np.sum(
            ~np.isclose(got, want, atol=atol, rtol=0)
        )
        print(f"      mismatches: {mism}/{got.size}")
    return ok


def main() -> int:
    from pointcloud_orientation_tpu.ops import geometry as G
    from pointcloud_orientation_tpu.ops.pallas_kernels import (
        ball_query_pallas,
        fps_pallas,
        knn_pallas,
        sa_group_coords_pallas,
        sa_group_feats_pallas,
    )

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return 0
    G.set_pallas_mode("never")  # the jnp references must stay pure-XLA
    ok = True
    key = jax.random.PRNGKey(0)

    for B, N, S, K in [(8, 1024, 128, 32), (2, 10000, 128, 32)]:
        xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
        cidx = G.random_sample_indices(jax.random.PRNGKey(1), B, N, S)
        new_xyz = G.index_points(xyz, cidx)

        ref_idx = G.knn_query(new_xyz, xyz, K)
        ok &= check(
            f"knn_pallas B={B} N={N}",
            knn_pallas(new_xyz, xyz, K, interpret=False),
            ref_idx,
        )

        ref_fps = G.farthest_point_sample(xyz, S)
        ok &= check(
            f"fps_pallas B={B} N={N}",
            fps_pallas(xyz, S, interpret=False),
            ref_fps,
        )

        r = 0.3
        ref_ball = G.ball_query(r, K, xyz, new_xyz)
        ok &= check(
            f"ball_query_pallas B={B} N={N}",
            ball_query_pallas(r, K, xyz, new_xyz, interpret=False),
            ref_ball,
        )

        nxp, grouped, idx = sa_group_coords_pallas(xyz, cidx, K, interpret=False)
        ok &= check(f"sa_group coords idx B={B} N={N}", idx, ref_idx)
        ok &= check(f"sa_group new_xyz B={B} N={N}", nxp, new_xyz)
        ref_centered = G.index_points(xyz, ref_idx) - new_xyz[:, :, None, :]
        ok &= check(
            f"sa_group centered B={B} N={N}", grouped, ref_centered, exact=True
        )

    # feature-bearing fused grouping at the sa2 shape
    B, N, S, K, D = 8, 128, 32, 32, 128
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, N, D), jnp.float32)
    cidx = G.random_sample_indices(jax.random.PRNGKey(3), B, N, S)
    new_xyz = G.index_points(xyz, cidx)
    ref_idx = G.knn_query(new_xyz, xyz, K)
    nxp, grouped, idx = sa_group_feats_pallas(xyz, feats, cidx, K, False)
    ok &= check("sa_group_feats idx (sa2 shape)", idx, ref_idx)
    ok &= check(
        "sa_group_feats coords", grouped[..., :3],
        G.index_points(xyz, ref_idx) - new_xyz[:, :, None, :],
    )
    ok &= check("sa_group_feats feats", grouped[..., 3:], G.index_points(feats, ref_idx))

    # scatter VJP on device
    def loss_pallas(f):
        _, g, _ = sa_group_feats_pallas(xyz, f, cidx, K, False)
        return jnp.sum(g[..., 3:] ** 3)

    def loss_ref(f):
        return jnp.sum(G.index_points(f, ref_idx) ** 3)

    gp = jax.grad(loss_pallas)(feats)
    gr = jax.grad(loss_ref)(feats)
    # rtol: rows gathered with multiplicity ~16 accumulate in a different
    # order than XLA's scatter-add -> last-ulp f32 noise (measured 3.6e-7
    # relative on device)
    ok &= check("sa_group_feats VJP scatter", gp, gr, exact=False, rtol=1e-5)

    # fused shared-MLP + max-pool kernel at the sa1/sa2 trunk shapes, fwd+VJP
    from pointcloud_orientation_tpu.ops.pallas_kernels import sa_mlp_max_pallas

    for tag, (B, K, S, C, chans) in {
        "sa1": (8, 32, 128, 3, (64, 64, 128)),
        "sa2": (8, 32, 32, 131, (128, 128, 256)),
    }.items():
        kg = jax.random.PRNGKey(5)
        g = jax.random.normal(kg, (B, K, S, C), jnp.float32)
        layers, cin = [], C
        for i, c in enumerate(chans):
            wk, sk, tk = jax.random.split(jax.random.PRNGKey(10 + i), 3)
            layers.append((
                jax.random.normal(wk, (cin, c), jnp.float32) * 0.2,
                jax.random.uniform(sk, (c,), jnp.float32, 0.5, 1.5),
                jax.random.normal(tk, (c,), jnp.float32) * 0.1,
            ))
            cin = c

        def mlp_ref(g, layers):
            x = g
            for w, s, t in layers:
                z = jax.lax.dot_general(
                    x, w, dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                x = jnp.maximum(z * s + t, 0.0)
            return jnp.max(x, axis=1)

        ok &= check(
            f"sa_mlp_max fwd ({tag})",
            sa_mlp_max_pallas(g, layers, False, False),
            mlp_ref(g, layers),
            exact=False, atol=1e-4, rtol=1e-5,
        )
        gp = jax.grad(lambda g: jnp.sum(jnp.sin(
            sa_mlp_max_pallas(g, layers, False, False))))(g)
        gr = jax.grad(lambda g: jnp.sum(jnp.sin(mlp_ref(g, layers))))(g)
        ok &= check(f"sa_mlp_max VJP dgrouped ({tag})", gp, gr,
                    exact=False, atol=1e-4, rtol=1e-4)

    # ---- flash-attention backend vs the XLA attention backend ----
    from pointcloud_orientation_tpu.models import PointTransformer

    x = jax.random.normal(jax.random.PRNGKey(12), (2, 512, 3), jnp.float32)
    mx = PointTransformer(depth=2, ffn_dim=128)
    mf = PointTransformer(depth=2, ffn_dim=128, attention_impl="flash")
    vparams = mx.init({"params": jax.random.PRNGKey(13)}, x, train=False)
    ok &= check(
        "point_transformer flash == xla attention",
        mf.apply(vparams, x, train=False),
        mx.apply(vparams, x, train=False),
        exact=False, atol=2e-3, rtol=1e-4,
    )
    gf = jax.grad(lambda p: jnp.sum(
        mf.apply({"params": p}, x, train=False) ** 2))(vparams["params"])
    gx = jax.grad(lambda p: jnp.sum(
        mx.apply({"params": p}, x, train=False) ** 2))(vparams["params"])
    flat_f = jnp.concatenate([jnp.ravel(a) for a in jax.tree_util.tree_leaves(gf)])
    flat_x = jnp.concatenate([jnp.ravel(a) for a in jax.tree_util.tree_leaves(gx)])
    ok &= check("point_transformer flash VJP == xla VJP", flat_f, flat_x,
                exact=False, atol=5e-2, rtol=1e-3)

    # ---- approx_min_k (PartialReduce) on-chip recall at the opt-in's
    # target shape: the approximate path's usefulness rests on this number
    # (RESULTS.md measured 0.978 at recall_target=0.95) ----
    xyz = jax.random.normal(jax.random.PRNGKey(14), (4, 10_000, 3), jnp.float32)
    new_xyz = xyz[:, :128]
    d = G.square_distance(new_xyz, xyz)
    _, exact_idx = jax.lax.top_k(-d, 32)
    _, approx_idx = jax.lax.approx_min_k(d, 32, recall_target=0.95)
    e, a = np.asarray(exact_idx), np.asarray(approx_idx)
    recall = np.mean([
        len(set(e[b, s]) & set(a[b, s])) / 32
        for b in range(e.shape[0]) for s in range(0, e.shape[1], 8)
    ])
    rec_ok = recall >= 0.95
    print(f"{'PASS' if rec_ok else 'FAIL'}  approx_min_k on-chip recall "
          f"{recall:.4f} >= 0.95 (N=10k)")
    ok &= rec_ok

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
