"""SUPERSEDED (round 2): measures round-1 selection variants; its numbers do NOT
reflect the shipped pipeline. Use profile_ab_modes.py /
profile_step_r2.py (live-carry timing rule, CLAUDE.md) or
bench.py for decisions.

Measure neighbor-selection + gather primitive costs at the SA shapes.

Compares the Pallas kernels against XLA's native top_k / approx_min_k
(TPU PartialReduce) and gather formulations to pick the fastest exact and
approximate paths. Value-fetch sync; scan loops (see profile_stages.py).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

B, S, N, K = 64, 128, 1024, 32
STEPS = 50


def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def body(c, i):
            return fn(c + 1e-12 * i.astype(jnp.float32), *a), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return c

    float(np.asarray(many(*args)))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(many(*args)))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name:46s} {best * 1e3:8.3f} ms")
    return best


def main():
    from pointcloud_orientation_tpu.ops import geometry as G
    from pointcloud_orientation_tpu.ops.pallas_kernels import (
        gather_pallas,
        knn_gather_pallas,
        knn_pallas,
    )

    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    new_xyz = jax.random.normal(jax.random.PRNGKey(1), (B, S, 3), jnp.float32)
    print(f"B={B} S={S} N={N} K={K} backend={jax.default_backend()}")

    def dist_only(c, a, b):
        d = G.square_distance(a + c, b + c)
        return jnp.sum(d) * 0 + c

    timeit("square_distance (B,S,N)", dist_only, new_xyz, xyz)

    def topk(c, a, b):
        d = G.square_distance(a + c, b + c)
        _, idx = jax.lax.top_k(-d, K)
        return jnp.sum(idx.astype(jnp.float32)) * 0 + c

    timeit("dist + lax.top_k", topk, new_xyz, xyz)

    for rt in (0.95, 0.99):
        def approx(c, a, b, rt=rt):
            d = G.square_distance(a + c, b + c)
            _, idx = jax.lax.approx_min_k(d, K, recall_target=rt)
            return jnp.sum(idx.astype(jnp.float32)) * 0 + c

        timeit(f"dist + approx_min_k(recall={rt})", approx, new_xyz, xyz)

    def sort_based(c, a, b):
        d = G.square_distance(a + c, b + c)
        idx = jnp.argsort(d, axis=-1)[..., :K]
        return jnp.sum(idx.astype(jnp.float32)) * 0 + c

    timeit("dist + argsort[:K]", sort_based, new_xyz, xyz)

    def pallas_knn(c, a, b):
        idx = knn_pallas(a + c, b + c, K)
        return jnp.sum(idx.astype(jnp.float32)) * 0 + c

    timeit("knn_pallas (select only)", pallas_knn, new_xyz, xyz)

    def pallas_fused(c, a, b):
        _, g = knn_gather_pallas(a + c, b + c, K)
        return jnp.sum(g[..., 0]) * 0 + c

    timeit("knn_gather_pallas (select+gather+center)", pallas_fused, new_xyz, xyz)

    # gathers at the sa1 shape: (B,S*K) rows from (B,N,3)
    idx = jax.random.randint(jax.random.PRNGKey(2), (B, S * K), 0, N)

    def xla_gather(c, pts, idx):
        g = jnp.take_along_axis(pts + c, idx[:, :, None], axis=1)
        return jnp.sum(g) * 0 + c

    timeit("XLA gather (B,S*K,3) of coords", xla_gather, xyz, idx)

    def oh_gather(c, pts, idx):
        g = gather_pallas(pts + c, idx)
        return jnp.sum(g) * 0 + c

    timeit("gather_pallas (one-hot MXU) coords", oh_gather, xyz, idx)

    # ---- sa2 shapes: S2=32 centroids, N2=128 points, feature gather D=128
    S2, N2, D = 32, 128, 128
    l1_xyz = jax.random.normal(key, (B, N2, 3), jnp.float32)
    l1_pts = jax.random.normal(key, (B, N2, D), jnp.float32)
    nx2 = jax.random.normal(jax.random.PRNGKey(3), (B, S2, 3), jnp.float32)
    idx2 = jax.random.randint(jax.random.PRNGKey(4), (B, S2 * K), 0, N2)

    def sa2_topk(c, a, b):
        d = G.square_distance(a + c, b + c)
        _, idx = jax.lax.top_k(-d, K)
        return jnp.sum(idx.astype(jnp.float32)) * 0 + c

    timeit("sa2: dist + top_k (S=32,N=128)", sa2_topk, nx2, l1_xyz)

    def sa2_xla_gather(c, pts, idx):
        g = jnp.take_along_axis(pts + c, idx[:, :, None], axis=1)
        return jnp.sum(g) * 0 + c

    timeit("sa2: XLA gather (B,1024,128) feats", sa2_xla_gather, l1_pts, idx2)

    def sa2_oh_gather(c, pts, idx):
        g = gather_pallas(pts + c, idx)
        return jnp.sum(g) * 0 + c

    timeit("sa2: gather_pallas feats", sa2_oh_gather, l1_pts, idx2)

    def sa2_onehot_xla(c, pts, idx):
        # one-hot matmul gather in plain XLA (MXU): (B,R,N2)@(B,N2,D)
        oh = jax.nn.one_hot(idx, N2, dtype=jnp.bfloat16)
        g = jnp.einsum("brn,bnd->brd", oh, (pts + c).astype(jnp.bfloat16))
        return jnp.sum(g.astype(jnp.float32)) * 0 + c

    timeit("sa2: one-hot matmul gather (XLA bf16)", sa2_onehot_xla, l1_pts, idx2)


if __name__ == "__main__":
    main()
