"""Why is the point-transformer train step slow at N=1024? (r4 probe)

Suspect: attention-probability dropout. Each of the 6 layers draws a
(B, H, N, N) dropout mask — 16·4·1024² ≈ 67M threefry words per layer,
~400M per step — and threefry is ~10+ VPU ops/word, so the RNG alone can
cost seconds while the matmuls cost milliseconds (d_model=64).

Variants timed (B=16, N=1024, canonical preset shapes, value-fetch sync):
  train_xla      full train step, XLA attention, dropout on (the preset)
  eval_xla       forward only, train=False (no dropout anywhere)
  train_nodrop   train step with dropout_rate=0 (isolates the RNG cost)
  train_flash    train step, Pallas flash attention (no prob-dropout by
                 construction; residual/FFN dropout still on)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_orientation_tpu.models import MODEL_REGISTRY

B, N = 16, 1024
STEPS = 10


def timed(fn, *args, rounds=3):
    @jax.jit
    def many(c, *args):
        def body(c, _):
            out = fn(c, *args)
            return c + out * 1e-9, None

        c, _ = jax.lax.scan(body, c, jnp.arange(STEPS))
        return c

    float(np.asarray(many(jnp.float32(0.0), *args)))  # compile+warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(np.asarray(many(jnp.float32(0.0), *args)))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3), jnp.float32)
    tgt = jax.random.normal(key, (B, 3), jnp.float32)

    def build(attention_impl="xla", dropout=None):
        kw = dict(attention_impl=attention_impl)
        if dropout is not None:
            kw["dropout"] = dropout
        m = MODEL_REGISTRY["point_transformer"](**kw)
        variables = m.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            pts, train=False)
        return m, variables

    def train_step(m, variables):
        def fn(c, pts, tgt):
            def loss(p):
                out = m.apply({"params": p}, pts + c * 1e-9, train=True,
                              rngs={"dropout": jax.random.PRNGKey(3)})
                return jnp.mean((out - tgt) ** 2)

            l, g = jax.value_and_grad(loss)(variables["params"])
            return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g)) * 1e-12

        return fn

    def eval_step(m, variables):
        def fn(c, pts, tgt):
            out = m.apply({"params": variables["params"]}, pts + c * 1e-9,
                          train=False)
            return jnp.mean((out - tgt) ** 2)

        return fn

    print(f"backend: {jax.default_backend()}  B={B} N={N}")
    m, v = build("xla")
    print(f"train_xla    : {timed(train_step(m, v), pts, tgt):9.2f} ms/step")
    print(f"eval_xla     : {timed(eval_step(m, v), pts, tgt):9.2f} ms/step")
    m0, v0 = build("xla", dropout=0.0)
    print(f"train_nodrop : {timed(train_step(m0, v0), pts, tgt):9.2f} ms/step")
    mf, vf = build("flash")
    print(f"train_flash  : {timed(train_step(mf, vf), pts, tgt):9.2f} ms/step")

    # MoE variant: same data/objective + 0.01-weight switch aux
    mm = MODEL_REGISTRY["moe_point_transformer"](n_experts=4)
    vm_ = mm.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        pts, train=False)

    def moe_train(c, pts, tgt):
        def loss(p):
            out, aux = mm.apply({"params": p}, pts + c * 1e-9, train=True,
                                rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.mean((out - tgt) ** 2) + 0.01 * aux

        l, g = jax.value_and_grad(loss)(vm_["params"])
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g)) * 1e-12

    print(f"train_moe    : {timed(moe_train, pts, tgt):9.2f} ms/step")

    # capacity-factor gather dispatch (same params tree — dispatch is a
    # trace-time formulation choice): K*C token-slots of FFN compute
    # instead of K*T (factor/K of the masked cost) + cumsum/gather/scatter
    mcap = MODEL_REGISTRY["moe_point_transformer"](
        n_experts=4, dispatch="capacity", capacity_factor=1.25)

    def moe_cap_train(c, pts, tgt):
        def loss(p):
            out, aux = mcap.apply({"params": p}, pts + c * 1e-9, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.mean((out - tgt) ** 2) + 0.01 * aux

        l, g = jax.value_and_grad(loss)(vm_["params"])
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g)) * 1e-12

    print(f"train_moe_cap: {timed(moe_cap_train, pts, tgt):9.2f} ms/step")


if __name__ == "__main__":
    main()
