"""Find the VMEM ceiling of the fused kNN / SA-grouping kernels (r4).

At N=32,768 `knn_pallas` holds a (S, N) f32 tile + temps in VMEM and the
Mosaic register allocator spills past the 128 MB budget — the compile
FAILS (HTTP 500 from the remote compile helper, r4 grid-scaling log).
The dispatch gates (`_pallas_eligible`, `_fused_group_eligible`) had no
upper bound, so a user at large N got a crash instead of the XLA top_k
fallback. This probe compiles each kernel at growing N (B=1 — the grid
is over B, so per-program VMEM is N-dependent only) and prints the
largest N that compiles; geometry.py pins its upper bounds to the result.

    python benchmarks/probe_pallas_bounds.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

S, K = 512, 32


def try_compile(fn, *args) -> bool:
    try:
        np.asarray(jax.jit(fn)(*args))
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"    -> FAIL: {msg}", flush=True)
        return False


def main():
    from pointcloud_orientation_tpu.ops.pallas_kernels import (
        knn_pallas,
        sa_group_coords_pallas,
    )

    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}  S={S} K={K}")

    for name, make in (
        ("knn_pallas", lambda xyz, cent: knn_pallas(cent, xyz, K)),
        ("sa_group", lambda xyz, cidx: sa_group_coords_pallas(
            xyz, cidx, K)[2]),
    ):
        for n in (8192, 12288, 16384, 20480, 24576, 32768):
            xyz = jax.random.normal(key, (1, n, 3), jnp.float32)
            if name == "knn_pallas":
                arg = xyz[:, :S]
            else:
                arg = jnp.arange(S, dtype=jnp.int32)[None]
            ok = try_compile(make, xyz, arg)
            print(f"{name} N={n}: {'ok' if ok else 'FAIL'}", flush=True)
            if not ok:
                break


if __name__ == "__main__":
    main()
