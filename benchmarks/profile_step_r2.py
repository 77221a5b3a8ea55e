"""Round-2 profile of the ACTUAL dispatched pipeline at the bench shape
(B=64, N=1024, bf16 trunk): full train step, eval forward, and the current
Pallas kernels (sa_group_coords/feats, fused MLP+max fwd/bwd) at the real
sa1/sa2/sa3 shapes. Timing = device-side lax.scan + value fetch (CLAUDE.md:
block_until_ready does not sync the remote TPU).

    python benchmarks/profile_step_r2.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

B, N, STEPS = 64, 1024, 50
DT = jnp.bfloat16


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
    print(f"{name:46s} {best * 1e3:8.3f} ms", flush=True)
    return best


def main():
    from pointcloud_orientation_tpu.models import PointNetPP8Dir
    from pointcloud_orientation_tpu.ops.pallas_kernels import (
        sa_group_coords_pallas,
        sa_group_feats_pallas,
        sa_mlp_max_pallas,
    )

    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    target = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, 8)))
    print(f"B={B} N={N} dtype=bf16 backend={jax.default_backend()}", flush=True)

    # ---- current grouping kernels at the real trunk shapes ----
    cidx1 = jax.random.randint(key, (B, 128), 0, N)

    def g1(c, xyz, cidx):
        nx, grouped, _ = sa_group_coords_pallas(xyz + c, cidx, 32)
        return jnp.sum(grouped[0, :, 0].astype(jnp.float32)) * 0 + c

    timeit("sa1 sa_group_coords (S=128,K=32)", g1, xyz, cidx1)

    l1_xyz = jax.random.normal(key, (B, 128, 3), jnp.float32)
    l1_pts = jax.random.normal(key, (B, 128, 128), jnp.float32)
    cidx2 = jax.random.randint(key, (B, 32), 0, 128)

    def g2(c, x, p, cidx):
        nx, grouped, _ = sa_group_feats_pallas(x + c, p + c, cidx, 32, False)
        return jnp.sum(grouped[0, :, 0].astype(jnp.float32)) * 0 + c

    timeit("sa2 sa_group_feats (S=32,K=32,C=131)", g2, l1_xyz, l1_pts, cidx2)

    # ---- fused MLP+max kernels (fwd and fwd+bwd) at trunk shapes ----
    def mk_layers(cin, chans, k):
        layers = []
        for co in chans:
            w = jax.random.normal(k, (cin, co), jnp.float32) * 0.1
            layers.append((w, jnp.ones((co,)), jnp.zeros((co,))))
            cin = co
        return layers

    for tag, (kk, ss, cin, chans) in {
        "sa1": (32, 128, 3, (64, 64, 128)),
        "sa2": (32, 32, 131, (128, 128, 256)),
        "sa3": (32, 1, 259, (256, 512, 1024)),
    }.items():
        g = jax.random.normal(key, (B, kk, ss, cin), jnp.float32)
        layers = mk_layers(cin, chans, key)

        def fwd(c, g, layers=layers):
            out = sa_mlp_max_pallas(
                jax.tree.map(lambda a: a + 0 * c, g), layers, True, False
            )
            return jnp.sum(out[0, 0].astype(jnp.float32)) * 0 + c

        timeit(f"{tag} fused MLP+max fwd", fwd, g)

        def fwdbwd(c, g, layers=layers):
            def loss(g2, ls):
                return jnp.sum(sa_mlp_max_pallas(g2, ls, True, False) * c)

            dg, dl = jax.grad(loss, argnums=(0, 1))(g, layers)
            return jnp.sum(dg[0, 0].astype(jnp.float32)) * 0 + c

        timeit(f"{tag} fused MLP+max fwd+bwd", fwdbwd, g)

    # ---- full model: eval fwd, train fwd, train fwd+bwd+adam ----
    model = PointNetPP8Dir(dtype=DT)
    variables = model.init(
        {"params": key, "dropout": key, "sampling": key}, xyz, train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def eval_fwd(c, params, batch_stats, x):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x + c, train=False
        )
        return jnp.sum(logits.astype(jnp.float32)) * 0 + c

    timeit("model eval forward", eval_fwd, params, batch_stats, xyz)

    def train_fwd(c, params, batch_stats, x):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x + c,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)},
        )
        return jnp.sum(logits.astype(jnp.float32)) * 0 + c

    timeit("model train forward", train_fwd, params, batch_stats, xyz)

    def train_step(c, params, batch_stats, opt_state, x, target):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x + c,
                train=True,
                mutable=["batch_stats"],
                rngs={
                    "dropout": jax.random.PRNGKey(2),
                    "sampling": jax.random.PRNGKey(3),
                },
            )
            ls = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.sum(target * ls, axis=-1)), upd

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, _ = tx.update(grads, opt_state, params)
        p2 = optax.apply_updates(params, updates)
        return jnp.sum(jax.tree.leaves(p2)[0].astype(jnp.float32)) * 0 * loss + c

    timeit("model FULL train step (fwd+bwd+adam)", train_step, params,
           batch_stats, opt_state, xyz, target)


if __name__ == "__main__":
    main()
