"""Microbenchmarks answering two kernel-design questions (VERDICT r1 item 3):

1. Does the v5e VPU execute bf16 elementwise ops at 2x f32 rate under
   Mosaic (packed)? If yes, a bf16-key selection variant could halve the
   argmin-loop cost; if no, the f32 loop is already at the issue-rate floor.
2. Per-pass op-count of selection formulations: jnp.argmin vs explicit
   min + first-tie-break (the kernel needs the tie-break either way for
   duplicated points — resampling-with-replacement produces exact ties).

Also measures threshold-counting (bitwise radix select) per-pass cost to
close VERDICT item 3 with numbers: counting passes are cheaper than argmin
passes, but the index/row EMISSION still needs one pass per neighbor slot,
so at K=32, N=1024 radix(31) + emit(32) >= argmin(32) — recorded either way.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, N, K = 64, 128, 1024, 32
STEPS = 30
REPS = 32  # elementwise reps inside the micro kernels


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
    print(f"{name:46s} {best * 1e3:8.3f} ms")
    return best


# ---- 1. elementwise rate: f32 vs bf16 vs i16 ----


def _ew_kernel(x_ref, o_ref):
    x = x_ref[:, :]
    for _ in range(REPS):
        x = jnp.maximum(x + x, x * x)
    o_ref[:, :] = x


def ew(dtype):
    x = jnp.ones((B, S, N), dtype)

    def run(c, x):
        out = pl.pallas_call(
            _ew_kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((None, S, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, S, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S, N), dtype),
        )(x + c.astype(dtype))
        return jnp.sum(out[:, 0, 0].astype(jnp.float32)) * 0 + c

    timeit(f"elementwise x{REPS} {jnp.dtype(dtype).name}", run, x)


# ---- 2. selection-pass formulations (select only, no extraction) ----


def _sel_argmin_kernel(d_ref, o_ref, scratch):
    S_, N_ = scratch.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (S_, N_), 1)
    scratch[:, :] = d_ref[:, :]
    for k in range(K):
        d = scratch[:, :]
        col = jnp.argmin(d, axis=1).astype(jnp.int32)
        o_ref[k, :] = col
        scratch[:, :] = jnp.where(lane == col[:, None], jnp.inf, d)


def _sel_mintie_kernel(d_ref, o_ref, scratch):
    S_, N_ = scratch.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (S_, N_), 1)
    scratch[:, :] = d_ref[:, :]
    for k in range(K):
        d = scratch[:, :]
        m = jnp.min(d, axis=1, keepdims=True)
        col = jnp.min(jnp.where(d == m, lane, N_), axis=1).astype(jnp.int32)
        o_ref[k, :] = col
        scratch[:, :] = jnp.where(lane == col[:, None], jnp.inf, d)


def _radix_count_kernel(d_ref, o_ref, scratch):
    """31 bitwise threshold-count passes (the counting half of a radix
    select; emission not included — see module docstring)."""
    S_, N_ = scratch.shape
    bits = pltpu.bitcast(d_ref[:, :], jnp.int32)  # d >= 0 -> monotone
    scratch[:, :] = bits.astype(jnp.float32) * 0  # keep scratch alive
    prefix = jnp.zeros((S_, 1), jnp.int32)
    for b in range(30, -1, -1):
        cand = prefix | (1 << b)
        cnt = jnp.sum((bits < cand).astype(jnp.float32), axis=1, keepdims=True)
        prefix = jnp.where(cnt >= float(K), prefix, cand)
    o_ref[0, :] = prefix[:, 0]


def _count_emit_kernel(d_ref, o_ref, scratch):
    """Full threshold-count alternative: 31 radix count passes to find the
    per-row K-th distance, then tie-resolution + index emission WITHOUT
    argmin passes — rank via cumsum (log2(N) shifted adds) and a chunked
    one-hot contraction over K output slots. Emits lane-order indices (the
    fused-SA consumer max-pools, so neighbor order is irrelevant)."""
    S_, N_ = scratch.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (S_, N_), 1)
    bits = pltpu.bitcast(d_ref[:, :], jnp.int32)
    scratch[:, :] = bits.astype(jnp.float32) * 0
    prefix = jnp.zeros((S_, 1), jnp.int32)
    for b in range(30, -1, -1):
        cand = prefix | (1 << b)
        cnt = jnp.sum((bits < cand).astype(jnp.float32), axis=1, keepdims=True)
        prefix = jnp.where(cnt >= float(K), prefix, cand)
    # mask: all strictly-below plus first (K - n_below) ties in lane order
    below = bits < prefix
    n_below = jnp.sum(below.astype(jnp.float32), axis=1, keepdims=True)
    eq = bits == prefix
    # cumulative count along lanes via log2(N) shifted adds
    cum = eq.astype(jnp.float32)
    shift = 1
    while shift < N_:
        shifted = jnp.pad(cum, ((0, 0), (shift, 0)))[:, :N_]
        cum = cum + shifted
        shift *= 2
    mask = below | (eq & (cum <= (float(K) - n_below)))
    # rank among selected (lane order), same cumulative trick
    r = mask.astype(jnp.float32)
    shift = 1
    while shift < N_:
        shifted = jnp.pad(r, ((0, 0), (shift, 0)))[:, :N_]
        r = r + shifted
        shift *= 2
    r = jnp.where(mask, r, 0.0)  # 1..K on selected lanes, 0 elsewhere
    # emission: chunked one-hot contraction over the K output slots
    CH = 256
    acc = jnp.zeros((K, S_), jnp.float32)
    slot = jax.lax.broadcasted_iota(jnp.float32, (K, S_, CH), 0) + 1.0
    for start in range(0, N_, CH):
        rs = r[:, start : start + CH]  # (S, CH)
        ls = lane[:, start : start + CH].astype(jnp.float32)
        onehot = (slot == rs[None, :, :]).astype(jnp.float32)  # (K,S,CH)
        acc = acc + jnp.sum(onehot * ls[None, :, :], axis=2)
    o_ref[:, :] = acc.astype(jnp.int32)


def sel(kernel, name, out_shape):
    d = jax.random.uniform(jax.random.PRNGKey(0), (B, S, N), jnp.float32)

    def run(c, d):
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((None, S, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None,) + out_shape, lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B,) + out_shape, jnp.int32),
            scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(d + c)
        return jnp.sum(out[:, 0, :8].astype(jnp.float32)) * 0 + c

    timeit(name, run, d)


if __name__ == "__main__":
    print(f"B={B} S={S} N={N} K={K} backend={jax.default_backend()}")
    for dt in (jnp.float32, jnp.bfloat16, jnp.int16):
        try:
            ew(dt)
        except Exception as e:  # Mosaic can't legalize some i16 vector ops
            print(f"elementwise {jnp.dtype(dt).name}: unsupported "
                  f"({type(e).__name__})")
    sel(_sel_argmin_kernel, "select: argmin loop (K passes)", (K, S))
    sel(_sel_mintie_kernel, "select: min+tie-break loop (K passes)", (K, S))
    sel(_radix_count_kernel, "select: 31 radix count passes (no emit)", (1, S))
    sel(_count_emit_kernel, "select: count + cumsum-rank + onehot emit", (K, S))
