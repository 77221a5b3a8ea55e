"""Serving-path latency/throughput of `infer.OrientationPredictor` on TPU.

Measures per-request wall latency INCLUDING host padding + transfer + fetch
(what a caller experiences through the remote tunnel) and the device-side
model latency (scan-amortized, value-fetch synced) for B=1 and B=64 at
N=1024 and N=10,000.

    python benchmarks/serve_latency.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def device_latency(model, variables, B, N, steps=50):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)

    @jax.jit
    def many(x):
        def body(c, i):
            out = model.apply(variables, x + c * 1e-12, train=False)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return c

    float(np.asarray(many(x)))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(many(x)))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3


def device_latency_int8(model, variables, B, N, steps=50):
    """Weight-only int8 path: dequant runs inside the program each step,
    exactly as the serving predictor dispatches it."""
    from pointcloud_orientation_tpu.utils import (
        dequantize_params,
        quantize_params_int8,
    )

    qparams, scales = quantize_params_int8(variables["params"])
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    scales = {k: jnp.asarray(v) for k, v in scales.items()}
    rest = {k: v for k, v in variables.items() if k != "params"}
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)

    @jax.jit
    def many(x):
        def body(c, i):
            v = dict(rest, params=dequantize_params(qparams, scales))
            out = model.apply(v, x + c * 1e-12, train=False)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return c

    float(np.asarray(many(x)))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(many(x)))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3


def request_latency(pred, B, N, reps=20):
    clouds = np.random.default_rng(0).normal(size=(B, N, 3)).astype(np.float32)
    pred(clouds)  # compile the bucket
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = pred(clouds)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


def main():
    from pointcloud_orientation_tpu.infer import OrientationPredictor
    from pointcloud_orientation_tpu.models import MODEL_REGISTRY

    print(f"backend={jax.default_backend()}", flush=True)
    for N in (1024, 10_000):
        model = MODEL_REGISTRY["pointnet_pp_8dir"]()
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((2, N, 3), jnp.float32),
            train=False,
        )
        pred = OrientationPredictor(
            "pointnet_pp_8dir",
            variables["params"],
            variables.get("batch_stats"),
            num_points=N,
        )
        pred8 = OrientationPredictor(
            "pointnet_pp_8dir",
            variables["params"],
            variables.get("batch_stats"),
            num_points=N,
            quantize="int8",
        )
        for B in (1, 64):
            dev = device_latency(model, variables, B, N)
            req = request_latency(pred, B, N)
            print(
                f"N={N:>6} B={B:>3}  device {dev:7.2f} ms/batch "
                f"({B / dev * 1e3:8.0f} clouds/s)   end-to-end request "
                f"{req:7.1f} ms (incl. tunnel)",
                flush=True,
            )
            dev8 = device_latency_int8(model, variables, B, N)
            req8 = request_latency(pred8, B, N)
            print(
                f"N={N:>6} B={B:>3}  device {dev8:7.2f} ms/batch "
                f"({B / dev8 * 1e3:8.0f} clouds/s)   end-to-end request "
                f"{req8:7.1f} ms (incl. tunnel)  [int8 weights]",
                flush=True,
            )


if __name__ == "__main__":
    main()
