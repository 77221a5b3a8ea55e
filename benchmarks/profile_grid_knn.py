"""Grid-pruned exact kNN vs the brute-force exact path on TPU (VERDICT r3
perf item #4): isolate WHERE the composed grid program spends its time.

Variants (B=16, S=512, N=10,000, K=32 — the canonical large-N stage):
  exact        `_exact_full_knn` (fused Pallas brute-force tile)
  grid_core    pruned path WITHOUT the fallback cond (timing the machinery)
  grid_cond    full `_grid_pruned_knn` (certificate + lax.cond fallback)

All timings use the value-fetch sync + device-side lax.scan loop (results
fed LIVE into the carry at ~1e-9 scale so XLA cannot DCE a stage).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_orientation_tpu.ops import geometry as G

import os

B = int(os.environ.get("GRIDPROF_B", "16"))
S = int(os.environ.get("GRIDPROF_S", "512"))
N = int(os.environ.get("GRIDPROF_N", "10000"))
K = int(os.environ.get("GRIDPROF_K", "32"))
STEPS = int(os.environ.get("GRIDPROF_STEPS", "50"))


def timed(fn, *args, rounds=3):
    @jax.jit
    def many(c, new_xyz, xyz):
        def body(c, i):
            out = fn(new_xyz + c * 1e-9, xyz + c * 1e-9)
            return c + jnp.sum(out).astype(jnp.float32) * 1e-9, None

        c, _ = jax.lax.scan(body, c, jnp.arange(STEPS))
        return c

    new_xyz, xyz = args
    float(np.asarray(many(jnp.float32(0.0), new_xyz, xyz)))  # compile+warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(np.asarray(many(jnp.float32(0.0), new_xyz, xyz)))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    new_xyz = xyz[:, :S]

    print(f"backend: {jax.default_backend()}  B={B} S={S} N={N} K={K} "
          f"G={G._KNN_GRID_G} r={G._KNN_GRID_R} M={G._KNN_GRID_M}")

    # certificate rate at this shape
    idx_c, ok = jax.jit(lambda a, b: G._grid_pruned_core(a, b, K))(new_xyz, xyz)
    print("certificate ok:", bool(np.asarray(ok)))

    t_exact = timed(lambda a, b: G._exact_full_knn(a, b, K), new_xyz, xyz)
    print(f"exact full : {t_exact:8.3f} ms/call")

    t_core = timed(lambda a, b: G._grid_pruned_core(a, b, K)[0], new_xyz, xyz)
    print(f"grid core  : {t_core:8.3f} ms/call (no cond)")

    t_cond = timed(lambda a, b: G._grid_pruned_knn(a, b, K), new_xyz, xyz)
    print(f"grid + cond: {t_cond:8.3f} ms/call")

    print(f"speedup core vs exact: {t_exact / t_core:.2f}x; "
          f"cond overhead: {t_cond - t_core:.3f} ms")


if __name__ == "__main__":
    main()
