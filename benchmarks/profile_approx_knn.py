"""Does `lax.approx_min_k` (TPU PartialReduce) beat the measured selection?

The one k-selection formulation the r1-r3 settlement never measured is the
hardware one: XLA-TPU lowers `jax.lax.approx_min_k` to the PartialReduce
custom op — a single-pass bin-wise reduction the chip executes far faster
than `lax.top_k`'s full sort. It cannot run *inside* a Pallas kernel, so
the candidate formulation is a pure-XLA knn: distances (MXU einsum) +
approx_min_k, vs (a) the shipped fused Pallas grouping passes and (b) the
old top_k XLA path.

Semantics: approx_min_k trades exactness for speed (recall_target < 1).
An approximate neighbor set changes grouping semantics vs the reference,
so this could only ever be an OPT-IN (like bf16) — this script measures
whether the speed is worth wiring it up, and the empirical recall at our
shapes.

Timing: value-fetch synced, results kept LIVE through the scan carry
(CLAUDE.md measurement rules).

Usage (TPU): python benchmarks/profile_approx_knn.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_orientation_tpu.ops.geometry import square_distance

STEPS = 30

SHAPES = [  # (B, S, N, K) — sa1 bench shape; reference-canonical N=10k
    (64, 128, 1024, 32),
    (16, 128, 10000, 32),
]


def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def body(c, i):
            out = fn(c, i, *a)
            # full-tensor reduction: the selections are row-independent, so
            # consuming only a slice would let XLA narrow the work
            return c + 1e-9 * jnp.sum(out.astype(jnp.float32)), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return c

    float(np.asarray(many(*args)))  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(many(*args)))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name:52s} {best * 1e3:8.3f} ms")
    return best


def jitter(c, i, x):
    # keep inputs live/step-varying so nothing folds
    return x + (c + i.astype(jnp.float32)) * 1e-12


def main():
    print(f"backend: {jax.default_backend()}")
    for B, S, N, K in SHAPES:
        key = jax.random.PRNGKey(0)
        xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
        new_xyz = xyz[:, :S]

        print(f"--- B={B} S={S} N={N} K={K} ---")

        def topk_path(c, i, new_xyz, xyz):
            d = square_distance(jitter(c, i, new_xyz), xyz)
            _, idx = jax.lax.top_k(-d, K)
            return idx

        def approx_path(recall):
            def f(c, i, new_xyz, xyz):
                d = square_distance(jitter(c, i, new_xyz), xyz)
                _, idx = jax.lax.approx_min_k(d, K, recall_target=recall)
                return idx

            return f

        def argsortless_min_loop(c, i, new_xyz, xyz):
            # XLA-side K argmin passes (what the Pallas kernel does, but
            # materialized) — for scale
            d = square_distance(jitter(c, i, new_xyz), xyz)

            def body(dd, _):
                a = jnp.argmin(dd, axis=-1)
                dd = dd.at[
                    jnp.arange(B)[:, None], jnp.arange(S)[None, :], a
                ].set(jnp.inf)
                return dd, a

            _, idxs = jax.lax.scan(body, d, None, length=K)
            return jnp.moveaxis(idxs, 0, -1)

        def pallas_path(c, i, new_xyz, xyz):
            from pointcloud_orientation_tpu.ops.pallas_kernels import knn_pallas

            return knn_pallas(jitter(c, i, new_xyz), xyz, K)

        t_topk = timeit("dist + top_k (old XLA path)", topk_path, new_xyz, xyz)
        t_a95 = timeit("dist + approx_min_k recall=0.95", approx_path(0.95), new_xyz, xyz)
        t_a99 = timeit("dist + approx_min_k recall=0.99", approx_path(0.99), new_xyz, xyz)
        t_pl = timeit("knn_pallas (shipped fused selection)", pallas_path, new_xyz, xyz)
        timeit("dist + K argmin passes (XLA scatter)", argsortless_min_loop, new_xyz, xyz)

        # empirical recall (set overlap with the exact top-k result)
        d = square_distance(new_xyz, xyz)
        _, exact = jax.lax.top_k(-d, K)
        for recall, label in [(0.95, "0.95"), (0.99, "0.99")]:
            _, approx = jax.lax.approx_min_k(d, K, recall_target=recall)
            e = np.asarray(exact)
            a = np.asarray(approx)
            hits = np.mean(
                [
                    len(set(e[b, s]) & set(a[b, s])) / K
                    for b in range(B)
                    for s in range(0, S, max(1, S // 32))
                ]
            )
            print(f"empirical recall @ target {label}: {hits:.4f}")
        print(
            f"speedups vs top_k: approx95 {t_topk / t_a95:.2f}x, "
            f"approx99 {t_topk / t_a99:.2f}x, pallas {t_topk / t_pl:.2f}x"
        )


if __name__ == "__main__":
    main()
