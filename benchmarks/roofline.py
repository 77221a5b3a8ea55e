"""Roofline / MFU accounting for the headline bench step (analysis, no TPU).

Answers "how close to speed-of-light is the 2.78 ms train step?" with
numbers instead of vibes:

1. **Model FLOPs** — XLA's HLO cost analysis of the *pure-XLA* train/eval
   step at the bench shape (B=64, N=1024). The Pallas path computes the
   same math (parity pinned by `tpu_check.py`), so this is the FLOP count
   of the TPU program too; custom-call kernels just hide theirs from the
   counter. Lowered on CPU — dot/reduce FLOP counts are shape-derived and
   platform-independent.
2. **MXU MFU** — those FLOPs against the v5e bf16 peak (197 TFLOP/s) over
   the *measured* step time (pass via --train-ms/--eval-ms; defaults are
   the RESULTS.md round-3 numbers).
3. **Selection VPU accounting** — the step is selection-bound
   (RESULTS.md k-selection section): analytic element-visit counts for the
   K argmin passes vs the VPU ALU ceiling, against the measured
   selection-only microbench (`profile_vpu_select.py`).

Usage (CPU, ~1 min):
    python benchmarks/roofline.py [--train-ms 2.78] [--eval-ms 2.62]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
try:  # this environment pre-registers the axon TPU plugin at startup
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()
except Exception:  # pragma: no cover
    pass

import jax.numpy as jnp
import numpy as np
import optax

# TPU v5e public peaks (per chip).
V5E_BF16_FLOPS = 197e12
V5E_HBM_GBPS = 819e9
# VPU elementwise ceiling: (8, 128)-lane vregs x 4 ALUs x ~940 MHz clock.
V5E_VPU_OPS = 8 * 128 * 4 * 0.94e9

B, N = 64, 1024


def _steps():
    from pointcloud_orientation_tpu.models import PointNetPP8Dir
    from pointcloud_orientation_tpu.ops.geometry import set_pallas_mode

    set_pallas_mode("never")  # pure-XLA formulation: countable FLOPs
    model = PointNetPP8Dir(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, 3), jnp.float32)
    target = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, 8)))
    variables = model.init(
        {"params": key, "dropout": key, "sampling": key}, x, train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, rng, x, target):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x,
                train=True,
                rngs={"dropout": jax.random.fold_in(rng, 0),
                      "sampling": jax.random.fold_in(rng, 1)},
                mutable=["batch_stats"],
            )
            loss = -jnp.mean(jnp.sum(target * jax.nn.log_softmax(logits, -1), -1))
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    def eval_step(params, batch_stats, rng, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=False, rngs={"sampling": rng},
        )

    args_t = (params, batch_stats, opt_state, jax.random.PRNGKey(7), x, target)
    args_e = (params, batch_stats, jax.random.PRNGKey(7), x)
    return train_step, args_t, eval_step, args_e


def _cost(fn, args):
    compiled = jax.jit(fn).lower(*args).compile()
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):  # older jax returns [dict]
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def selection_accounting(train_ms: float) -> dict:
    """Analytic VPU op counts for the argmin selection passes.

    Per pass, argmin over an (S, N) distance tile costs per element: one
    validity mask select, one running-min compare+select pair, and the
    one-hot index materialization -- ~5 elementwise visits -- plus an
    intra-vreg lane reduction per S-row (amortized across N/128 vregs).
    sa1: S=128 over N=1024; sa2: S=32 over N=128; K=32 passes each.
    """
    visits_per_elem = 5.0
    sa1 = 32 * 128 * 1024 * visits_per_elem
    sa2 = 32 * 32 * 128 * visits_per_elem
    per_cloud = sa1 + sa2
    total = per_cloud * B
    # measured selection-only microbench at the sa1 shape (RESULTS.md):
    measured_sa1_ms = 2.246
    sa1_ops = sa1 * B
    return {
        "analytic_vpu_ops_per_batch": total,
        "vpu_floor_us": total / V5E_VPU_OPS * 1e6,
        "measured_sa1_select_ms": measured_sa1_ms,
        "sa1_vpu_utilization_pct": sa1_ops / (measured_sa1_ms * 1e-3) / V5E_VPU_OPS * 100,
        "select_share_of_train_step_pct": (
            100 * measured_sa1_ms / train_ms if train_ms else None),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-ms", type=float, default=2.78)
    ap.add_argument("--eval-ms", type=float, default=2.62)
    a = ap.parse_args()

    train_step, args_t, eval_step, args_e = _steps()
    f_train, b_train = _cost(train_step, args_t)
    f_eval, b_eval = _cost(eval_step, args_e)

    out = {
        "shape": {"batch": B, "points": N},
        "train": {
            "hlo_flops": f_train,
            "hlo_bytes": b_train,
            "measured_ms": a.train_ms,
            "achieved_tflops": f_train / (a.train_ms * 1e-3) / 1e12,
            "mxu_mfu_pct": f_train / (a.train_ms * 1e-3) / V5E_BF16_FLOPS * 100,
            "hbm_bw_pct_upper": b_train / (a.train_ms * 1e-3) / V5E_HBM_GBPS * 100,
        },
        "eval": {
            "hlo_flops": f_eval,
            "measured_ms": a.eval_ms,
            "achieved_tflops": f_eval / (a.eval_ms * 1e-3) / 1e12,
            "mxu_mfu_pct": f_eval / (a.eval_ms * 1e-3) / V5E_BF16_FLOPS * 100,
        },
        "selection": selection_accounting(a.train_ms),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
