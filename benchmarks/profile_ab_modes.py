"""End-to-end A/B of dispatch modes at the bench shape: full train step and
eval forward under (fused MLP on/off) x (pallas grouping on/off). These are
the numbers that decide kernel dispatch policy — isolated kernel timings
mislead (sequential per-batch grid cells, cold weight residency).

    PCOT_FUSED_MLP=0|1 python benchmarks/profile_ab_modes.py [never|auto]
"""

from __future__ import annotations

import os
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
            return fn(c + 1e-12 * i.astype(jnp.float32), *a), None

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
    from pointcloud_orientation_tpu.ops import geometry as G

    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    G.set_pallas_mode(mode)
    fused = os.environ.get("PCOT_FUSED_MLP", "1") != "0"
    tag = f"pallas={mode} fused_mlp={int(fused)}"

    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    target = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, 8)))
    model = PointNetPP8Dir(dtype=jnp.bfloat16)
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
        return jnp.sum(logits.astype(jnp.float32)) * 1e-9 + c

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
        return jnp.sum(jax.tree.leaves(p2)[0].astype(jnp.float32)) * 1e-9 * loss + c

    timeit(f"[{tag}] eval forward", eval_fwd, params, batch_stats, xyz)
    timeit(f"[{tag}] FULL train step", train_step, params, batch_stats,
           opt_state, xyz, target)


if __name__ == "__main__":
    main()
