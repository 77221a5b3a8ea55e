"""SUPERSEDED (round 2): measures round-1 dispatch; its numbers do NOT
reflect the shipped pipeline. Use profile_ab_modes.py /
profile_step_r2.py (live-carry timing rule, CLAUDE.md) or
bench.py for decisions.

Stage-level timing of the flagship train step on the real TPU.

Times (value-fetch-synced, scan-amortized — see CLAUDE.md on
block_until_ready):
  * full train step (bench.py workload) with each dispatch config,
  * the fused grouping kernel alone at sa1/sa2 shapes,
  * the fused MLP+max kernel vs the unfused XLA MLP+BN+max.

Run: python benchmarks/profile_sa_stage.py   (TPU; ~3 min)
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

B, N = 64, 1024
STEPS = 100


def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def body(c, i):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + jnp.sum(leaf[..., :1].astype(jnp.float32)) * 1e-20, None

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


def train_step_timing(tag):
    from pointcloud_orientation_tpu.models import PointNetPP8Dir

    model = PointNetPP8Dir(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, 3), jnp.float32)
    target = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, 8)))
    variables = model.init({"params": key, "dropout": key, "sampling": key}, x,
                           train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": key, "sampling": key},
                mutable=["batch_stats"])
            loss = -jnp.mean(jnp.sum(target * jax.nn.log_softmax(logits, -1), -1))
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state

    def fwd(params, batch_stats):
        return model.apply({"params": params, "batch_stats": batch_stats}, x,
                           train=False, rngs={"sampling": key})

    timeit(f"train step ({tag})", step, params, batch_stats, opt_state)
    timeit(f"forward eval ({tag})", fwd, params, batch_stats)


def kernel_timings():
    from pointcloud_orientation_tpu.ops import geometry as G
    from pointcloud_orientation_tpu.ops.pallas_kernels import (
        sa_group_coords_pallas, sa_group_feats_pallas, sa_mlp_max_pallas)

    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    cidx = G.random_sample_indices(jax.random.PRNGKey(1), B, N, 128)
    timeit("sa1 grouping kernel (S=128 K=32 N=1024)",
           functools.partial(sa_group_coords_pallas, nsample=32), xyz, cidx)

    l1 = jax.random.normal(key, (B, 128, 3), jnp.float32)
    f1 = jax.random.normal(key, (B, 128, 128), jnp.float32)
    c2 = G.random_sample_indices(jax.random.PRNGKey(2), B, 128, 32)
    timeit("sa2 grouping kernel (S=32 K=32 N=128 D=128)",
           lambda a, b, c: sa_group_feats_pallas(a, b, c, 32, False), l1, f1, c2)

    for tag, (K, S, C, chans) in {
        "sa1": (32, 128, 3, (64, 64, 128)),
        "sa2": (32, 32, 131, (128, 128, 256)),
    }.items():
        g = jax.random.normal(key, (B, K, S, C), jnp.float32)
        layers, cin = [], C
        for c in chans:
            layers.append((jax.random.normal(key, (cin, c), jnp.float32) * 0.2,
                           jnp.ones((c,), jnp.float32),
                           jnp.zeros((c,), jnp.float32)))
            cin = c
        timeit(f"fused MLP+max fwd ({tag})",
               lambda g: sa_mlp_max_pallas(g, layers, True, False), g)
        timeit(f"fused MLP+max fwd+bwd ({tag})",
               jax.grad(lambda g: jnp.sum(sa_mlp_max_pallas(g, layers, True,
                                                            False))), g)

        def xla_mlp(g):
            x = g.astype(jnp.bfloat16)
            for w, s, t in layers:
                z = jnp.einsum("bksc,cd->bksd", x, w.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                m = jnp.mean(z, axis=(0, 1, 2))
                v = jnp.mean(z * z, axis=(0, 1, 2)) - m * m
                x = jnp.maximum((z - m) * jax.lax.rsqrt(v + 1e-5) * s + t,
                                0.0).astype(jnp.bfloat16)
            return jnp.max(x, axis=1)

        timeit(f"XLA MLP+BN+max fwd ({tag})", xla_mlp, g)
        timeit(f"XLA MLP+BN+max fwd+bwd ({tag})",
               jax.grad(lambda g: jnp.sum(xla_mlp(g).astype(jnp.float32))), g)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} B={B} N={N}")
    if os.environ.get("PCOT_FUSED_MLP") == "0":
        train_step_timing("fused grouping only")
    else:
        train_step_timing("fused grouping + fused MLP")
    kernel_timings()
