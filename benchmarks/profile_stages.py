"""SUPERSEDED (round 2): measures round-1 components (pre-fused dispatch); its numbers do NOT
reflect the shipped pipeline. Use profile_ab_modes.py /
profile_step_r2.py (live-carry timing rule, CLAUDE.md) or
bench.py for decisions.

Stage-level timing of the PointNet++ forward at the bench shape.

Times each pipeline stage in isolation with device-side scan loops and
value-fetch sync (block_until_ready does not wait for remote TPU compute in
this environment — see CLAUDE.md). Each scan iteration perturbs its input
with the loop carry so XLA cannot hoist the body out of the loop.

Run: python benchmarks/profile_stages.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

B, N, STEPS = 64, 1024, 50
DT = jnp.bfloat16


def timeit(name, fn, *args):
    """fn(carry_scalar, *args) -> scalar; scanned STEPS times."""

    @jax.jit
    def many(*a):
        def body(c, i):
            return fn(c + 1e-12 * i.astype(jnp.float32), *a), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return c

    float(np.asarray(many(*args)))  # compile + warmup
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(many(*args)))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name:42s} {best * 1e3:8.3f} ms")
    return best


def main():
    from flax import linen as nn

    from pointcloud_orientation_tpu.models import PointNetPP8Dir
    from pointcloud_orientation_tpu.models.layers import SetAbstraction, SharedMLP
    from pointcloud_orientation_tpu.ops import geometry as G
    from pointcloud_orientation_tpu.ops.pallas_kernels import knn_gather_pallas

    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    print(f"B={B} N={N} dtype={DT.__name__} backend={jax.default_backend()}")

    # --- sa1 grouping: fused knn+gather+center Pallas kernel ---
    skey = jax.random.PRNGKey(1)
    cent_idx = G.random_sample_indices(skey, B, N, 128)
    new_xyz = G.index_points(xyz, cent_idx)

    def sa1_group(c, xyz, new_xyz):
        _, centered = knn_gather_pallas(new_xyz + c, xyz + c, 32)
        return jnp.sum(centered[..., 0].astype(jnp.float32)) * 0 + c

    timeit("sa1 grouping (fused pallas)", sa1_group, xyz, new_xyz)

    # --- sa1 centroid sampling + gather ---
    def sa1_sample(c, xyz):
        idx = G.random_sample_indices(jax.random.PRNGKey(3), B, N, 128)
        nx = G.index_points(xyz + c, idx)
        return jnp.sum(nx) * 0 + c

    timeit("sa1 centroid sample+gather", sa1_sample, xyz)

    # --- sa1 MLP+BN(train)+ReLU+max on grouped data ---
    grouped = jax.random.normal(key, (B, 128, 32, 3), jnp.float32)
    mlp1 = SharedMLP((64, 64, 128), dtype=DT)
    v1 = mlp1.init(key, grouped, train=True)

    def sa1_mlp(c, g):
        out, _ = mlp1.apply(v1, g + c, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.max(out, axis=2).astype(jnp.float32)) * 0 + c

    timeit("sa1 MLP+BN(train)+max", sa1_mlp, grouped)

    # --- sa2: knn (XLA, N=128) + gathers + MLP ---
    l1_xyz = jax.random.normal(key, (B, 128, 3), jnp.float32)
    l1_pts = jax.random.normal(key, (B, 128, 128), jnp.float32)

    def sa2_group(c, l1_xyz, l1_pts):
        idx = G.random_sample_indices(jax.random.PRNGKey(4), B, 128, 32)
        nx = G.index_points(l1_xyz + c, idx)
        knn = G.knn_query(nx, l1_xyz + c, 32)
        gx = G.index_points(l1_xyz, knn) - nx[:, :, None, :]
        gp = G.index_points(l1_pts, knn)
        return (jnp.sum(gx) + jnp.sum(gp)) * 0 + c

    timeit("sa2 sample+knn+gathers (XLA)", sa2_group, l1_xyz, l1_pts)

    grouped2 = jax.random.normal(key, (B, 32, 32, 131), jnp.float32)
    mlp2 = SharedMLP((128, 128, 256), dtype=DT)
    v2 = mlp2.init(key, grouped2, train=True)

    def sa2_mlp(c, g):
        out, _ = mlp2.apply(v2, g + c, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.max(out, axis=2).astype(jnp.float32)) * 0 + c

    timeit("sa2 MLP+BN(train)+max", sa2_mlp, grouped2)

    # --- sa3 group_all MLP ---
    grouped3 = jax.random.normal(key, (B, 1, 32, 259), jnp.float32)
    mlp3 = SharedMLP((256, 512, 1024), dtype=DT)
    v3 = mlp3.init(key, grouped3, train=True)

    def sa3_mlp(c, g):
        out, _ = mlp3.apply(v3, g + c, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.max(out, axis=2).astype(jnp.float32)) * 0 + c

    timeit("sa3 MLP+BN(train)+max", sa3_mlp, grouped3)

    # --- full SA stages through the real module ---
    for name, (sa, xin, pin) in {
        "sa1 full": (SetAbstraction(128, 32, (64, 64, 128), dtype=DT), xyz, None),
        "sa2 full": (
            SetAbstraction(32, 32, (128, 128, 256), dtype=DT),
            l1_xyz,
            l1_pts,
        ),
        "sa3 full": (
            SetAbstraction(None, None, (256, 512, 1024), group_all=True, dtype=DT),
            jax.random.normal(key, (B, 32, 3), jnp.float32),
            jax.random.normal(key, (B, 32, 256), jnp.float32),
        ),
    }.items():
        vs = sa.init({"params": key, "sampling": skey}, xin, pin, train=True)

        def sa_fwd(c, xin, pin, sa=sa, vs=vs):
            args = (xin + c, None if pin is None else pin + c)
            (nx, np_), _ = sa.apply(
                vs, *args, train=True,
                rngs={"sampling": skey}, mutable=["batch_stats"],
            )
            return jnp.sum(np_.astype(jnp.float32)) * 0 + c

        timeit(name, sa_fwd, xin, pin)

    # --- full model forward (train) / full train step ---
    model = PointNetPP8Dir(dtype=DT)
    variables = model.init(
        {"params": key, "dropout": key, "sampling": key}, xyz, train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    target = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, 8)))

    def fwd_train(c, x):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x + c, train=True,
            rngs={"dropout": key, "sampling": skey},
            mutable=["batch_stats"],
        )
        return jnp.sum(out) * 0 + c

    timeit("model forward (train)", fwd_train, xyz)

    def fwd_eval(c, x):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x + c, train=False, rngs={"sampling": skey},
        )
        return jnp.sum(out) * 0 + c

    timeit("model forward (eval)", fwd_eval, xyz)

    import optax

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def train_step(c, x):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x + c, train=True,
                rngs={"dropout": key, "sampling": skey},
                mutable=["batch_stats"],
            )
            loss = -jnp.mean(jnp.sum(target * jax.nn.log_softmax(logits, -1), -1))
            return loss, mut["batch_stats"]

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, _ = tx.update(grads, opt_state, params)
        return loss * 0 + c + jnp.sum(jax.tree_util.tree_leaves(upd)[0]) * 0

    timeit("full train step (fwd+bwd+adam)", train_step, xyz)


if __name__ == "__main__":
    main()
