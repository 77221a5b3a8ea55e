"""Driver-grade serving record at the reference-canonical N=10,000.

VERDICT r4 #7: `bench.py` records the flagship N=1024 workload; the
reference's canonical config is 10,000 points per cloud (`train.py:31`,
SURVEY.md §5). This script produces the committed record
``results/bench_n10k.json`` in one reproducible command:

    python benchmarks/bench_n10k.py

It measures eval-forward (serving) throughput of PointNetPP8Dir at
B=16, N=10,000 — the shape of the published 4,069 / 7,534 clouds/s rows in
RESULTS.md — for BOTH grouping dispatches:

- ``exact``  — the shipped fused Pallas grouping (reference-equal kNN);
- ``approx`` — opt-in `lax.approx_min_k` (TPU PartialReduce) at the shipped
  N>=4096 stage threshold (sa1 approximate, sa2/sa3 exact fused).

Measurement rules (CLAUDE.md): synchronize by FETCHING a value, amortize
tunnel latency with a device-side `lax.scan`, keep results live through the
scan carry (never ``*0``). Fetches run under bench.py's watchdog
(`_fetch_value`: deadline + one re-dispatch) so a tunnel hiccup cannot eat
the record — the round-4 lesson.

The knn knob is TRACE-time, so each mode gets a freshly built jitted
closure (new trace); modes run sequentially in one process.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # watchdog fetch + faulthandler pattern

BATCH = int(os.environ.get("BENCH10K_BATCH", 16))
POINTS = int(os.environ.get("BENCH10K_POINTS", 10_000))
STEPS = int(os.environ.get("BENCH10K_STEPS", 30))
ROUNDS = int(os.environ.get("BENCH10K_ROUNDS", 3))
OUT = Path(os.environ.get("BENCH10K_OUT",
                          REPO / "results" / "bench_n10k.json"))


def measure(mode: str) -> float:
    """Median eval-forward clouds/s over ROUNDS scan-amortized dispatches."""
    from pointcloud_orientation_tpu.models import PointNetPP8Dir
    from pointcloud_orientation_tpu.ops import set_knn_impl

    set_knn_impl(mode if mode != "exact" else "exact",
                 recall_target=0.95 if mode == "approx" else None)
    model = PointNetPP8Dir()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, POINTS, 3), jnp.float32)
    variables = model.init({"params": key}, x[:2], train=False)

    @jax.jit
    def eval_many(x):
        def body(c, i):
            out = model.apply(variables, x + c * 1e-12, train=False)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return c

    # compile + warm (fresh 10k program shape can take minutes cold)
    bench._fetch_value(lambda: float(np.asarray(eval_many(x))),
                       timeout_s=float(os.environ.get(
                           "BENCH10K_WARMUP_TIMEOUT_S", 600)))
    vals = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        bench._fetch_value(lambda: float(np.asarray(eval_many(x))))
        vals.append(BATCH * STEPS / (time.perf_counter() - t0))
    return sorted(vals)[len(vals) // 2]


def main():
    import faulthandler

    faulthandler.dump_traceback_later(120, repeat=True)
    base_path = REPO / "benchmarks" / "baseline_torch_10k.json"
    with open(base_path) as f:
        base = json.load(f)
    baseline = float(base["eval_clouds_per_sec"])

    record = {
        "metric": "serving point-clouds/sec/chip (eval fwd) at 10000 pts",
        "batch": BATCH,
        "points": POINTS,
        "unit": "clouds/s",
        "baseline_eval_clouds_per_sec_torch_cpu": baseline,
        "backend": jax.default_backend(),
        "modes": {},
    }
    for mode in ("exact", "approx"):
        v = measure(mode)
        record["modes"][mode] = {
            "value": round(v, 2),
            "vs_baseline": round(v / baseline, 2),
        }
        print(json.dumps({"metric": record["metric"], "mode": mode,
                          "value": round(v, 2), "unit": "clouds/s",
                          "vs_baseline": round(v / baseline, 2)}),
              flush=True)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(record, f, indent=2)
    print(f"record -> {OUT}", flush=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
