"""SUPERSEDED (round 2): measures block_until_ready timing, inflated on this remote TPU; its numbers do NOT
reflect the shipped pipeline. Use profile_ab_modes.py /
profile_step_r2.py (live-carry timing rule, CLAUDE.md) or
bench.py for decisions.

Stage-by-stage timing of the PointNet++ forward at the reference's
canonical shape (B=16, N=10,000) to direct kernel work.

    python benchmarks/profile_forward.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointcloud_orientation_tpu.ops import (
    farthest_point_sample,
    index_points,
    knn_query,
    random_sample_indices,
)


def bench(f, *a, n=30):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main(B=16, N=10_000, S=128, K=32):
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    new_xyz = xyz[:, :S]
    idx3 = jax.random.randint(key, (B, S, K), 0, N)

    stages = {
        "random_sample_indices(128 of 10k)": jax.jit(
            lambda k: random_sample_indices(k, B, N, S)
        ),
        "knn_query(S=128,K=32)": jax.jit(lambda c, x: knn_query(c, x, K)),
        "gather (B,S,K,3)": jax.jit(lambda x, i: index_points(x, i)),
        "fps(128)": jax.jit(lambda x: farthest_point_sample(x, S)),
    }
    print(f"B={B} N={N} S={S} K={K}  backend={jax.default_backend()}")
    print(f"{'stage':<38} {'ms':>8}")
    t = bench(stages["random_sample_indices(128 of 10k)"], key)
    print(f"{'random_sample_indices(128 of 10k)':<38} {t:>8.3f}")
    t = bench(stages["knn_query(S=128,K=32)"], new_xyz, xyz)
    print(f"{'knn_query(S=128,K=32)':<38} {t:>8.3f}")
    t = bench(stages["gather (B,S,K,3)"], xyz, idx3)
    print(f"{'gather (B,S,K,3)':<38} {t:>8.3f}")
    t = bench(stages["fps(128)"], xyz)
    print(f"{'fps(128)':<38} {t:>8.3f}")

    # full model forward for reference
    from pointcloud_orientation_tpu.models import PointNetPP8Dir

    model = PointNetPP8Dir()
    v = model.init(
        {"params": key, "sampling": jax.random.PRNGKey(1)}, xyz, train=False
    )
    fwd = jax.jit(
        lambda pts, rng: model.apply(v, pts, train=False, rngs={"sampling": rng})
    )
    t = bench(fwd, xyz, jax.random.PRNGKey(2))
    print(f"{'full forward':<38} {t:>8.3f}")


if __name__ == "__main__":
    main()
