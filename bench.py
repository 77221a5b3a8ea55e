"""Headline benchmark: point-clouds/sec/chip at 1024 points (train+infer).

Flagship workload: PointNetPP8Dir with the soft-label-KL objective — the
minimum end-to-end slice of SURVEY.md §7 — measured as an even mix of
optimizer steps and inference passes, matching the protocol of
``benchmarks/torch_baseline.py`` (the reference-equivalent PyTorch CPU
implementation that provides the ``vs_baseline`` denominator).

Prints ONE JSON line (schema below). Hardened for the remote-TPU tunnel
(round-4 lesson: BENCH_r04.json was rc=124 because one tunnel hang ate the
whole capture window):

- ``faulthandler.dump_traceback_later(120, repeat=True)`` runs from start,
  so a hang is diagnosable from stderr.
- Every device-value fetch runs in a daemon thread with a deadline
  (``BENCH_FETCH_TIMEOUT_S``, default 240 s) and is retried ONCE by
  re-dispatching the round; a poisoned fetch cannot freeze the process.
- A fully parseable JSON line is printed after the FIRST measured round;
  the final median line (same schema, ``"rounds"`` tells them apart)
  follows when all rounds finish. A mid-run hang therefore still leaves a
  driver-parseable record.
- ``BENCH_BUDGET_S`` (default 600) bounds wall-clock: remaining rounds are
  skipped when the budget would be exceeded, and the median of completed
  rounds is emitted.

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "rounds": N}
"""

from __future__ import annotations

import faulthandler
import json
import os
import sys
import threading
import time

import jax

# Honor an explicit JAX_PLATFORMS=cpu request even though this environment's
# site hook pre-registers the TPU plugin and re-forces the platform (the
# env var alone is overridden at interpreter startup). This keeps the
# hermetic smoke path (tests/test_evaluate.py::test_bench_smoke) off the
# real chip; normal bench runs are unaffected.
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
    except Exception:  # pragma: no cover - best effort
        pass

import jax.numpy as jnp
import numpy as np
import optax

BATCH = int(os.environ.get("BENCH_BATCH", 64))
POINTS = int(os.environ.get("BENCH_POINTS", 1024))
# 200 steps per dispatch: the remote-TPU tunnel costs ~45 ms per result
# fetch, which at 50 steps understates device throughput by ~25%; 200 steps
# amortizes it to ~3%.
STEPS = int(os.environ.get("BENCH_STEPS", 200))
# bfloat16 trunk compute (MXU-native; params/heads/geometry stay f32) —
# the framework's standard TPU configuration. Set BENCH_DTYPE=float32 for
# the full-precision variant (~20% slower, same convergence regime).
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
# measured by benchmarks/torch_baseline.py on this container's CPU
FALLBACK_BASELINE = 32.05
ROUNDS = int(os.environ.get("BENCH_ROUNDS", 3))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 600))
FETCH_TIMEOUT_S = float(os.environ.get("BENCH_FETCH_TIMEOUT_S", 240))
# test hook: pretend the k-th fetch call (1-based) hangs on its first
# attempt — exercises the watchdog+retry path hermetically
# (tests/test_evaluate.py::test_bench_survives_hung_fetch)
_SIMULATE_HANG_AT = int(os.environ.get("BENCH_SIMULATE_HANG_AT", 0))
_FETCH_INDEX = 0


def _fetch_value(dispatch, timeout_s: float = FETCH_TIMEOUT_S) -> float:
    """Run ``dispatch()`` (which must BOTH launch the computation and fetch
    a host value — the only true sync in this environment, see CLAUDE.md)
    in a daemon thread with a deadline. On timeout, re-dispatch ONCE with a
    doubled deadline: a tunnel hiccup poisons one in-flight fetch, not the
    program. Raises TimeoutError if the retry also hangs."""
    global _FETCH_INDEX
    _FETCH_INDEX += 1
    fetch_no = _FETCH_INDEX
    for attempt in range(2):
        deadline = timeout_s * (attempt + 1)
        box: dict = {}
        simulate = attempt == 0 and fetch_no == _SIMULATE_HANG_AT

        def work():
            try:
                if simulate:
                    time.sleep(deadline * 100)  # daemon thread; abandoned
                box["v"] = float(dispatch())
            except BaseException as e:  # noqa: BLE001 - reported below
                box["e"] = e

        th = threading.Thread(target=work, daemon=True)
        th.start()
        th.join(deadline)
        if "v" in box:
            return box["v"]
        if "e" in box:
            raise box["e"]
        sys.stderr.write(
            f"bench.py: fetch hung >{deadline:.0f}s "
            f"(attempt {attempt + 1}/2); "
            + ("re-dispatching\n" if attempt == 0 else "giving up\n")
        )
        sys.stderr.flush()
    raise TimeoutError(f"device fetch hung twice (timeout {timeout_s:.0f}s)")


def _emit(value: float, baseline: float, rounds_done: int) -> None:
    print(
        json.dumps(
            {
                "metric": f"point-clouds/sec/chip (train+infer) at {POINTS} pts",
                "value": round(value, 2),
                "unit": "clouds/s",
                "vs_baseline": round(value / baseline, 2),
                "rounds": rounds_done,
            }
        ),
        flush=True,
    )


def _baseline_clouds_per_sec() -> float:
    path = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline_torch.json")
    try:
        with open(path) as f:
            return float(json.load(f)["clouds_per_sec"])
    except (OSError, KeyError, ValueError):
        return FALLBACK_BASELINE


def main():
    # hang diagnosability (CLAUDE.md prescription for long TPU jobs): dump
    # all thread stacks to stderr every 120 s until cancelled at the end.
    faulthandler.dump_traceback_later(120, repeat=True)

    from pointcloud_orientation_tpu.models import PointNetPP8Dir

    dtype = None if DTYPE in ("float32", "f32", "") else jnp.dtype(DTYPE)
    model = PointNetPP8Dir(dtype=dtype)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, POINTS, 3), jnp.float32)
    target = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (BATCH, 8)))

    variables = model.init(
        {"params": key, "dropout": key, "sampling": key}, x, train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
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

    @jax.jit
    def eval_step(params, batch_stats, rng, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=False,
            rngs={"sampling": rng},
        )

    # device-side loops: scan STEPS steps inside ONE dispatch so host/tunnel
    # latency is excluded from the per-step measurement
    @jax.jit
    def train_many(params, batch_stats, opt_state, rng, x, target):
        def body(carry, i):
            params, batch_stats, opt_state = carry
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, jax.random.fold_in(rng, i), x, target
            )
            return (params, batch_stats, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(STEPS)
        )
        return params, batch_stats, opt_state, losses[-1]

    @jax.jit
    def eval_many(params, batch_stats, rng, x):
        def body(_, i):
            out = eval_step(params, batch_stats, jax.random.fold_in(rng, i), x)
            return None, jnp.sum(out)

        _, sums = jax.lax.scan(body, None, jnp.arange(STEPS))
        return sums[-1]

    # warmup / compile. IMPORTANT: synchronize by FETCHING VALUES — in this
    # environment jax.block_until_ready returns before remote computation
    # completes, inflating timings by orders of magnitude; a host read of
    # the result cannot. First compile can take minutes on a cold cache, so
    # the warmup fetch gets a longer leash than measured rounds.
    t_start = time.perf_counter()
    rng = jax.random.PRNGKey(7)

    def warmup():
        nonlocal params, batch_stats, opt_state
        params, batch_stats, opt_state, loss = train_many(
            params, batch_stats, opt_state, rng, x, target
        )
        return float(np.asarray(loss))

    warmup_timeout = float(
        os.environ.get("BENCH_WARMUP_TIMEOUT_S", max(FETCH_TIMEOUT_S, 300.0))
    )
    _fetch_value(warmup, timeout_s=warmup_timeout)
    _fetch_value(
        lambda: float(np.asarray(eval_many(params, batch_stats, rng, x)))
    )

    def measure_round(r):
        nonlocal params, batch_stats, opt_state
        t0 = time.perf_counter()

        def train_fetch():
            nonlocal params, batch_stats, opt_state
            params, batch_stats, opt_state, loss = train_many(
                params, batch_stats, opt_state, jax.random.fold_in(rng, r), x, target
            )
            return float(np.asarray(loss))  # true sync

        _fetch_value(train_fetch)
        t_train = time.perf_counter() - t0

        t0 = time.perf_counter()
        _fetch_value(
            lambda: float(
                np.asarray(
                    eval_many(params, batch_stats, jax.random.fold_in(rng, 999 + r), x)
                )
            )
        )
        t_eval = time.perf_counter() - t0
        return BATCH * STEPS * 2 / (t_train + t_eval)

    # median of up to BENCH_ROUNDS rounds, within the wall-clock budget.
    # A parseable record is emitted after EVERY completed round so a later
    # hang cannot erase the capture; the last line is the final median.
    baseline = _baseline_clouds_per_sec()
    values: list[float] = []
    per_round_s = None
    for r in range(ROUNDS):
        elapsed = time.perf_counter() - t_start
        if values and per_round_s and elapsed + per_round_s > BUDGET_S:
            sys.stderr.write(
                f"bench.py: budget {BUDGET_S:.0f}s would be exceeded "
                f"(elapsed {elapsed:.0f}s); emitting median of {len(values)} "
                f"round(s)\n"
            )
            break
        t0 = time.perf_counter()
        values.append(measure_round(r))
        per_round_s = time.perf_counter() - t0
        _emit(sorted(values)[len(values) // 2], baseline, len(values))
    # exit without joining any abandoned (hung) daemon fetch threads
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
