"""Cost of per-step PRNG + centroid sampling at the bench shape — the gap
between profile_ab_modes' fixed-key step (XLA hoists sampling out of the
scan) and bench.py's per-step fold_in (pays it every step).

    python benchmarks/profile_sampling.py
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


def timeit(name, fn, *args):
    @jax.jit
    def many(*a):
        def body(c, i):
            return fn(c + 1e-12 * i.astype(jnp.float32), i, *a), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return c

    float(np.asarray(many(*args)))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(many(*args)))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name:52s} {best * 1e3:8.3f} ms", flush=True)
    return best


def main():
    from pointcloud_orientation_tpu.models import PointNetPP8Dir
    from pointcloud_orientation_tpu.ops.geometry import random_sample_indices

    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    target = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, 8)))
    print(f"B={B} N={N} backend={jax.default_backend()}", flush=True)

    def foldins(c, i):
        k = jax.random.fold_in(key, i)
        k1 = jax.random.fold_in(k, 0)
        k2 = jax.random.fold_in(k, 1)
        return c + jnp.float32(k1[0] + k2[0]) * 1e-20

    timeit("3x fold_in", foldins)

    def samp1(c, i):
        k = jax.random.fold_in(key, i)
        idx = random_sample_indices(k, B, N, 128)
        return c + jnp.float32(idx[0, 0]) * 1e-20

    timeit("fold_in + sample 128 of 1024", samp1)

    def samp2(c, i):
        k = jax.random.fold_in(key, i)
        idx = random_sample_indices(k, B, 128, 32)
        return c + jnp.float32(idx[0, 0]) * 1e-20

    timeit("fold_in + sample 32 of 128", samp2)

    def unif(c, i):
        k = jax.random.fold_in(key, i)
        u = jax.random.uniform(k, (B, N))
        return c + u[0, 0] * 1e-12

    timeit("fold_in + uniform (B,1024)", unif)

    def topk(c, i, u):
        _, idx = jax.lax.top_k(u + c * 1e-20, 128)
        return c + jnp.float32(idx[0, 0]) * 1e-20

    timeit("top_k 128 of 1024", topk, jax.random.uniform(key, (B, N)))

    dk = jax.random.PRNGKey(2)

    def dropout_mask(c, i):
        k = jax.random.fold_in(dk, i)
        m = jax.random.bernoulli(k, 0.5, (B, 256))
        return c + jnp.float32(m[0, 0]) * 1e-12

    timeit("fold_in + dropout mask (B,256)", dropout_mask)

    # full train step, bench-style per-step rng vs fixed rng
    model = PointNetPP8Dir(dtype=jnp.bfloat16)
    variables = model.init(
        {"params": key, "dropout": key, "sampling": key}, xyz, train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def step(c, rngs, params, batch_stats, opt_state, x, target):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x + c,
                train=True,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            ls = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.sum(target * ls, axis=-1)), upd

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, _ = tx.update(grads, opt_state, params)
        p2 = optax.apply_updates(params, updates)
        return jnp.sum(jax.tree.leaves(p2)[0].astype(jnp.float32)) * 1e-9 * loss + c

    def fixed(c, i, *a):
        rngs = {"dropout": jax.random.PRNGKey(2),
                "sampling": jax.random.PRNGKey(3)}
        return step(c, rngs, *a)

    def perstep(c, i, *a):
        k = jax.random.fold_in(key, i)
        rngs = {"dropout": jax.random.fold_in(k, 0),
                "sampling": jax.random.fold_in(k, 1)}
        return step(c, rngs, *a)

    timeit("train step, FIXED rng (sampling hoisted)", fixed, params,
           batch_stats, opt_state, xyz, target)
    timeit("train step, PER-STEP rng (bench-style)", perstep, params,
           batch_stats, opt_state, xyz, target)


if __name__ == "__main__":
    main()
