"""Core point-cloud geometry primitives, formulated for XLA/TPU.

These reproduce the semantics of the reference's torch ops (see the parity
citations on each function) but are designed TPU-first:

* pairwise distances are expressed as one batched matmul (MXU work) plus
  rank-1 norm corrections, never an ``(B,S,N,3)`` broadcast subtract;
* neighbor selection uses ``jax.lax.top_k`` over a distance row instead of a
  full sort of index tensors;
* farthest-point sampling is a ``lax.fori_loop`` carrying an ``(B,N)``
  distance vector — static shapes, no host sync;
* gathers use ``jnp.take_along_axis`` which lowers to a single XLA gather.

All functions are jit-friendly: static shapes, no data-dependent Python
control flow.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather of ``points (B, N, C)`` by ``idx (B, S)`` or ``(B, S, K)``.

    Parity: ``index_points`` in the reference (`models/base.py:4-18`).
    """
    if idx.ndim == 2:
        return jnp.take_along_axis(points, idx[:, :, None], axis=1)
    elif idx.ndim == 3:
        B, S, K = idx.shape
        flat = jnp.take_along_axis(points, idx.reshape(B, S * K)[:, :, None], axis=1)
        return flat.reshape(B, S, K, points.shape[-1])
    raise ValueError(f"idx must be rank 2 or 3, got shape {idx.shape}")


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distance ``(B,N,C) x (B,M,C) -> (B,N,M)``.

    Computed as ``|src|^2 - 2 src.dst^T + |dst|^2`` so the dominant cost is a
    batched matmul on the MXU. Parity: `models/base.py:20-27`.
    """
    # Accumulate the cross term in f32 regardless of input dtype.
    # HIGHEST precision: the contraction dim is only 3, so full-f32 passes on
    # the MXU are free, and the -2ab + a^2 + b^2 form needs the accuracy.
    cross = jax.lax.dot_general(
        src,
        dst,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)
    return s2[:, :, None] - 2.0 * cross + d2[:, None, :]


# Pallas dispatch policy: "auto" uses the TPU kernels for shapes where they
# win (large N); "never" forces the pure-XLA path; "always" forces Pallas
# (interpret mode off-TPU — tests only).
_PALLAS_MODE = "auto"


def set_pallas_mode(mode: str) -> None:
    global _PALLAS_MODE
    if mode not in ("auto", "always", "never"):
        raise ValueError(f"bad pallas mode: {mode}")
    _PALLAS_MODE = mode


# Opt-in approximate kNN via jax.lax.approx_min_k (the TPU PartialReduce
# hardware top-k). Default "exact" keeps reference grouping semantics
# (`models/base.py:29-35`); "approx" is an opt-in large-N speedup like
# bf16: at the reference's canonical N=10,000 the selection runs 1.8x
# faster than the fused Pallas passes and 13.6x faster than lax.top_k at
# ~0.98 measured recall (benchmarks/profile_approx_knn.py) — at N=1024 it
# is a wash, and the fused kernel keeps the dispatch there. NOTE: like the
# other dispatch knobs this is read at TRACE time — set it (or PCOT_KNN /
# PCOT_KNN_RECALL) before the first jitted call.
_KNN_IMPL = "exact"
_KNN_RECALL = 0.95
# Below this many candidate points, "approx" still dispatches the exact
# fused kernel: PartialReduce only wins at large N (1.23 vs 2.42 ms at
# N=10k but 10.0k vs 21.2k clouds/s end-to-end at N=1024), and inside a
# 10k model the later SA stages select from only 128 candidates — those
# stay on the fused kernel (and stay exact) even under "approx".
_KNN_APPROX_MIN_N = 4096


def set_knn_impl(impl: str, recall_target: Optional[float] = None,
                 approx_min_n: Optional[int] = None) -> None:
    """Select the kNN grouping formulation: ``"exact"`` (default; fused
    Pallas kernel / top_k, reference semantics), ``"approx"``
    (``jax.lax.approx_min_k`` for stages with at least ``approx_min_n``
    candidate points — smaller stages keep the exact fused kernel;
    off-TPU backends lower approx_min_k exactly), or ``"grid"``
    (EXACT spatial pruning for the same large-N stages: 3D-bin the cloud,
    rescore only the cell cube around each centroid, certify exactness by
    the cube-boundary margin, and fall back to the full exact path when
    any sample fails certification — see :func:`_grid_pruned_knn`).

    ``"grid"`` is a MEASURED NEGATIVE RESULT kept for reference-semantics
    experimentation (RESULTS.md k-selection item 5): at the canonical
    N=10,000 it runs 38x slower than the brute-force tile, and even its
    component-sum lower bound loses 3x — index build + window gather are
    lane-serial VPU work that costs more than the whole MXU distance tile
    they avoid. Use ``"approx"`` for large-N speed (1.85x, ~0.98 recall)
    or the default ``"exact"`` otherwise."""
    global _KNN_IMPL, _KNN_RECALL, _KNN_APPROX_MIN_N
    # validate EVERYTHING before mutating: a failed call must not leave
    # half-applied global state (e.g. impl flipped but the old recall)
    if impl not in ("exact", "approx", "grid"):
        raise ValueError(f"bad knn impl: {impl}")
    if recall_target is not None and not 0.0 < recall_target <= 1.0:
        raise ValueError(f"bad recall_target: {recall_target}")
    if approx_min_n is not None and approx_min_n < 1:
        raise ValueError(f"bad approx_min_n: {approx_min_n}")
    _KNN_IMPL = impl
    if recall_target is not None:
        _KNN_RECALL = recall_target
    if approx_min_n is not None:
        _KNN_APPROX_MIN_N = approx_min_n


def _approx_eligible(n: int) -> bool:
    return _KNN_IMPL == "approx" and n >= _KNN_APPROX_MIN_N


def _grid_eligible(n: int) -> bool:
    # same stage threshold as "approx": pruning only pays where the
    # candidate set is large; small stages keep the fused exact kernel
    return _KNN_IMPL == "grid" and n >= _KNN_APPROX_MIN_N


# Route the env knobs through the validating setter so a typo
# (PCOT_KNN=Approx, =1) fails loudly at import instead of silently running
# the exact path under an "approx" banner. Values are .strip()ed first:
# whitespace is shell noise, not a user intent worth failing on.
if ("PCOT_KNN" in os.environ or "PCOT_KNN_RECALL" in os.environ
        or "PCOT_KNN_APPROX_MIN_N" in os.environ):
    set_knn_impl(
        os.environ.get("PCOT_KNN", "exact").strip(),
        float(os.environ["PCOT_KNN_RECALL"])
        if "PCOT_KNN_RECALL" in os.environ else None,
        int(os.environ["PCOT_KNN_APPROX_MIN_N"])
        if "PCOT_KNN_APPROX_MIN_N" in os.environ else None,
    )


def _approx_knn(new_xyz: jax.Array, xyz: jax.Array, nsample: int) -> jax.Array:
    dist = square_distance(new_xyz, xyz)  # (B, S, N)
    _, idx = jax.lax.approx_min_k(dist, nsample, recall_target=_KNN_RECALL)
    return idx.astype(jnp.int32)


# Grid-pruned EXACT kNN knobs (trace-time, like the other dispatch knobs).
# Defaults measured on the canonical N=10,000 clouds: G=8 bins per axis and
# a Chebyshev-1 cell cube certify 100% of samples exact with ~500 average
# candidates (a ~20x selection-work reduction); M is the static per-centroid
# candidate budget (cube overflow => certificate fails => full fallback).
_KNN_GRID_G = int(os.environ.get("PCOT_KNN_GRID_G", "8"))
_KNN_GRID_R = int(os.environ.get("PCOT_KNN_GRID_R", "1"))
_KNN_GRID_M = int(os.environ.get("PCOT_KNN_GRID_M", "1024"))


def _exact_full_knn(new_xyz: jax.Array, xyz: jax.Array, nsample: int) -> jax.Array:
    """The unpruned exact path (fused-tile Pallas kernel on TPU, else
    matmul-form distances + top_k) — also the grid path's fallback branch."""
    if _pallas_eligible(xyz.shape[1]):
        from .pallas_kernels import knn_pallas

        return knn_pallas(new_xyz, xyz, nsample)
    dist = square_distance(new_xyz, xyz)  # (B, S, N)
    _, idx = jax.lax.top_k(-dist, nsample)
    return idx.astype(jnp.int32)


def _grid_pruned_knn(new_xyz: jax.Array, xyz: jax.Array, nsample: int) -> jax.Array:
    """EXACT kNN with spatial candidate pruning (VERDICT r3 perf item:
    reference semantics `models/base.py:29-35` at large N without
    brute-forcing the full (S, N) tile).

    Two phases, all static shapes:

    1. Bin points into a ``G^3`` grid over the cloud's bounding box and
       sort them by linearized cell id (z fastest). Each centroid's
       candidate set is the ``(2r+1)^3`` cell cube around its own cell —
       ``(2r+1)^2`` *contiguous* runs of the sorted array, concatenated
       into a static ``M``-slot window per centroid.
    2. Exact f32 rescore of the window + K argmin selection passes
       (``topk_min_pallas`` on TPU; ``lax.top_k`` elsewhere).

    EXACTNESS CERTIFICATE: every point outside the cube is at least
    ``margin`` away (the centroid's distance to the nearest cube face that
    is interior to the domain), so ``d_K <= margin^2`` proves the true K
    nearest all live inside the cube. If ANY (batch, centroid) fails the
    certificate — or its cube overflows the M budget / holds fewer than K
    points — one batch-level ``lax.cond`` falls back to the full exact
    path, so the result is bit-identical to reference semantics in every
    case (pinned in ``tests/test_approx_knn.py``)."""
    idx, ok = _grid_pruned_core(new_xyz, xyz, nsample)
    return jax.lax.cond(
        ok,
        lambda _: idx,
        lambda _: _exact_full_knn(new_xyz, xyz, nsample),
        operand=None,
    )


def _grid_pruned_core(
    new_xyz: jax.Array, xyz: jax.Array, nsample: int
) -> Tuple[jax.Array, jax.Array]:
    """Grid-pruned candidate selection WITHOUT the exactness fallback:
    returns ``(idx (B,S,K) int32, ok () bool)`` where ``ok`` is the
    batch-level certificate (see :func:`_grid_pruned_knn`). Split out so
    tests/benchmarks can probe the pruned path and the certificate
    independently of the ``lax.cond`` dispatch."""
    B, N, _ = xyz.shape
    G, r = _KNN_GRID_G, _KNN_GRID_R
    M = max(min(_KNN_GRID_M, N), nsample)  # window must hold >= K slots
    x = xyz.astype(jnp.float32)
    c = new_xyz.astype(jnp.float32)
    lo = jnp.min(x, axis=1, keepdims=True) - 1e-6  # (B,1,3)
    hi = jnp.max(x, axis=1, keepdims=True) + 1e-6
    h = (hi - lo) / G
    cell = jnp.clip((x - lo) / h, 0, G - 1).astype(jnp.int32)  # (B,N,3)
    cid = (cell[..., 0] * G + cell[..., 1]) * G + cell[..., 2]  # (B,N)
    order = jnp.argsort(cid, axis=-1).astype(jnp.int32)
    cid_s = jnp.take_along_axis(cid, order, axis=-1)
    pts_s = jnp.take_along_axis(x, order[..., None], axis=1)  # (B,N,3)
    cells = jnp.arange(G * G * G + 1, dtype=jnp.int32)
    starts = jax.vmap(
        lambda a: jnp.searchsorted(a, cells, side="left"))(cid_s)
    starts = starts.astype(jnp.int32)  # (B, G^3+1)

    ccell = jnp.clip((c - lo) / h, 0, G - 1).astype(jnp.int32)  # (B,S,3)
    offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
    dx = jnp.repeat(offs, 2 * r + 1)  # (R2,)
    dy = jnp.tile(offs, 2 * r + 1)
    cx = ccell[..., 0][..., None] + dx  # (B,S,R2)
    cy = ccell[..., 1][..., None] + dy
    in_range = (cx >= 0) & (cx < G) & (cy >= 0) & (cy < G)
    z0 = jnp.maximum(ccell[..., 2] - r, 0)[..., None]  # (B,S,1)
    z1 = jnp.minimum(ccell[..., 2] + r, G - 1)[..., None]
    base = (jnp.clip(cx, 0, G - 1) * G + jnp.clip(cy, 0, G - 1)) * G
    run_s = jnp.take_along_axis(starts[:, None, :], base + z0, axis=2)
    run_e = jnp.take_along_axis(starts[:, None, :], base + z1 + 1, axis=2)
    lens = jnp.where(in_range, run_e - run_s, 0)  # (B,S,R2)
    o = jnp.cumsum(lens, axis=-1)
    total = o[..., -1]  # (B,S) candidates in the cube
    prev = o - lens
    t = jnp.arange(M, dtype=jnp.int32)
    # run containing window slot t: j = #runs whose inclusive cumsum <= t
    j = jnp.sum(
        t[None, None, :, None] >= o[:, :, None, :], axis=-1
    ).astype(jnp.int32)  # (B,S,M)
    jc = jnp.minimum(j, lens.shape[-1] - 1)
    idx_sorted = (
        jnp.take_along_axis(run_s, jc, axis=-1)
        + t[None, None, :]
        - jnp.take_along_axis(prev, jc, axis=-1)
    ).astype(jnp.int32)
    valid = t[None, None, :] < total[..., None]
    idx_sorted = jnp.where(valid, idx_sorted, 0)
    cand = jnp.take_along_axis(
        pts_s[:, None], idx_sorted[..., None], axis=2)  # (B,S,M,3)
    d = jnp.sum((cand - c[:, :, None, :]) ** 2, axis=-1)
    d = jnp.where(valid, d, jnp.inf)

    if jax.default_backend() == "tpu" and _PALLAS_MODE != "never":
        from .pallas_kernels import topk_min_pallas

        sel = topk_min_pallas(d, nsample)
    else:
        _, sel = jax.lax.top_k(-d, nsample)
        sel = sel.astype(jnp.int32)
    idx_in_sorted = jnp.take_along_axis(idx_sorted, sel, axis=-1)  # (B,S,K)
    idx = jnp.take_along_axis(order[:, None], idx_in_sorted, axis=2)

    d_k = jnp.take_along_axis(d, sel[..., -1:], axis=-1)[..., 0]  # (B,S)
    cube_lo = lo + (ccell - r).astype(jnp.float32) * h  # (B,S,3)
    cube_hi = lo + (ccell + r + 1).astype(jnp.float32) * h
    m_lo = jnp.where(ccell - r <= 0, jnp.inf, c - cube_lo)
    m_hi = jnp.where(ccell + r + 1 >= G, jnp.inf, cube_hi - c)
    margin = jnp.minimum(m_lo, m_hi).min(-1)  # (B,S)
    ok = jnp.all(
        (d_k <= margin * margin) & (total <= M) & (total >= nsample))
    return idx, ok


# VMEM ceiling of the fused (S, N)-tile kernels, measured on v5e at S=512
# (benchmarks/probe_pallas_bounds.py): knn_pallas compiles at N=20,480 and
# FAILS at 24,576 (Mosaic register-spill past the 128 MB scoped budget —
# the r4 grid-scaling log has the raw error). Beyond the bound the XLA
# matmul+top_k path carries the op instead of crashing the compile.
_PALLAS_KNN_MAX_N = 20_480


def _pallas_eligible(n: int) -> bool:
    if _PALLAS_MODE == "never":
        return False
    if _PALLAS_MODE == "always":
        return True
    return (jax.default_backend() == "tpu"
            and 1024 <= n <= _PALLAS_KNN_MAX_N)


# Ceiling for the fused SA-grouping kernel (same (S, N) tile class as
# knn_pallas): measured ok at N=8,192, production-proven at the canonical
# N=10,000; the N=12,288 compile did not return in 15 min on the remote
# helper (probe_pallas_bounds.py) — treated as beyond the ceiling. Larger
# N falls to the unfused path (knn_query + index_points), whose own kernel
# is bounded at `_PALLAS_KNN_MAX_N` and falls to XLA top_k beyond that.
_FUSED_GROUP_MAX_N = 10_240


def _fused_group_eligible(n: int) -> bool:
    """The fused SA-grouping kernel wins from much smaller N than the
    standalone selection kernels (it also replaces the XLA gathers, which
    dominate at sa2's N=128)."""
    if _PALLAS_MODE == "never":
        return False
    if _PALLAS_MODE == "always":
        return True
    return (jax.default_backend() == "tpu"
            and 128 <= n <= _FUSED_GROUP_MAX_N)


def fused_mlp_eligible(train: bool = False) -> bool:
    """Whether the fused shared-MLP+max kernel should carry the SA compute
    stage (see :func:`..ops.pallas_kernels.sa_mlp_max_pallas`).

    Default policy is EVAL-ONLY: the eval fold of running-stats BatchNorm
    into per-layer scale/shift is exact and measured faster, while in train
    the ghost-stats side pass + recompute backward lose to XLA's fused MLP
    (benchmarks/profile_ab_modes.py: 3.01 vs 2.78 ms/step at B=64 N=1024).
    ``PCOT_FUSED_MLP=0`` disables everywhere; ``=1`` forces it on in train
    too (benchmarking). Train-mode dispatch is gated on the env var ALONE —
    ``set_pallas_mode('always')`` deliberately does NOT flip it, because the
    fused train path normalizes with 1/ghost_stride subsampled BatchNorm
    statistics and 'always' must keep reference BN semantics (ADVICE r2).

    NOTE: like ``PCOT_SA_DEFER``, this env var is read at TRACE time —
    changing it after a jitted program is compiled/cached has no effect;
    set it before the first call (or clear jit caches) when benchmarking.
    """
    env = os.environ.get("PCOT_FUSED_MLP")
    if env == "0":
        return False
    if _PALLAS_MODE == "never":
        return False
    if train and env != "1":
        return False
    if _PALLAS_MODE == "always":
        return True
    return jax.default_backend() == "tpu"


def knn_query(new_xyz: jax.Array, xyz: jax.Array, nsample: int) -> jax.Array:
    """Indices of the ``nsample`` nearest points in ``xyz (B,N,3)`` for each
    centroid in ``new_xyz (B,S,3)``; returns ``(B,S,nsample)`` int32.

    The reference calls this ``query_ball_point`` but it is a kNN — no radius
    filter (`models/base.py:29-35`). Large-N shapes on TPU dispatch to the
    fused Pallas kernel (7.6x the XLA formulation at the reference's
    canonical N=10k: the (B,S,N) distance tensor never leaves VMEM).
    With ``set_knn_impl("approx")`` selection instead rides the TPU's
    PartialReduce hardware top-k (1.8x the Pallas passes at N=10k,
    ~0.98 recall — opt-in, non-reference semantics).
    """
    if _approx_eligible(xyz.shape[1]):
        return _approx_knn(new_xyz, xyz, nsample)
    if _grid_eligible(xyz.shape[1]):
        return _grid_pruned_knn(new_xyz, xyz, nsample)
    return _exact_full_knn(new_xyz, xyz, nsample)


def ball_query(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array
) -> jax.Array:
    """True radius ball query with pad-with-first semantics.

    For each centroid, among points within ``radius``, pick the ``nsample``
    with the *smallest index* (not smallest distance); slots with no
    within-radius point are filled with the first within-radius index.
    Parity: `PointNet++Demo.py:49-70` (mark out-of-radius as N, sort indices,
    clamp to first).

    Returns ``(B, S, nsample)`` int32.
    """
    B, N, _ = xyz.shape
    if _pallas_eligible(N):
        from .pallas_kernels import ball_query_pallas

        return ball_query_pallas(radius, nsample, xyz, new_xyz)
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    arange = jax.lax.broadcasted_iota(jnp.int32, sqrdists.shape, 2)
    group_idx = jnp.where(sqrdists > radius**2, N, arange)
    # nsample smallest indices == top_k of negated values.
    neg_topk, _ = jax.lax.top_k(-group_idx, nsample)
    group_idx = (-neg_topk).astype(jnp.int32)  # ascending by index, N = invalid
    first = group_idx[:, :, :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    # Degenerate case (no point in radius at all): clamp into range.
    return jnp.clip(group_idx, 0, N - 1)


def farthest_point_sample(
    xyz: jax.Array, npoint: int, key: Optional[jax.Array] = None
) -> jax.Array:
    """Iterative farthest-point sampling; returns ``(B, npoint)`` int32 indices.

    Parity: `PointNet++Demo.py:8-29` (random initial point, then ``npoint``
    rounds of min-distance update + argmax). Expressed as a ``lax.fori_loop``
    carrying the running min-distance vector so the whole loop stays compiled
    on device; large-N shapes on TPU dispatch to the single-kernel Pallas
    implementation (3x: cloud + distance vector stay in VMEM for the whole
    loop).
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if key is None:
        farthest0 = jnp.zeros((B,), dtype=jnp.int32)
    else:
        farthest0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)

    # FPS holds only the (N, 3) cloud + an (N,) distance vector in VMEM
    # (linear in N, ~1 MB at N=65k) — the (S, N)-tile ceiling
    # `_PALLAS_KNN_MAX_N` does not apply, so gate on the floor alone.
    if _PALLAS_MODE == "always" or (
            _PALLAS_MODE != "never"
            and jax.default_backend() == "tpu" and N >= 1024):
        from .pallas_kernels import fps_pallas

        return fps_pallas(xyz, npoint, seeds=farthest0)

    centroids0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    distance0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    batch_idx = jnp.arange(B)

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = xyz[batch_idx, farthest][:, None, :]  # (B,1,3)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # (B,N)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids, _, _ = jax.lax.fori_loop(
        0, npoint, body, (centroids0, distance0, farthest0)
    )
    return centroids


def random_sample_indices(key: jax.Array, batch: int, n: int, npoint: int) -> jax.Array:
    """Per-sample random choice of ``npoint`` distinct indices out of ``n``.

    Parity with the reference's production sampling path, which substitutes
    ``torch.randperm(N)[:npoint]`` per batch element for true FPS
    (`models/pointnet_pp.py:28`). One fused uniform draw + per-row argsort.
    """
    u = jax.random.uniform(key, (batch, n))
    _, idx = jax.lax.top_k(u, npoint)
    return idx.astype(jnp.int32)


def sample_and_group(
    xyz: jax.Array,
    points: Optional[jax.Array],
    npoint: int,
    nsample: int,
    key: Optional[jax.Array] = None,
    sampling: str = "random",
    grouping: str = "knn",
    radius: float = 0.2,
    neighbor_major: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Sample ``npoint`` centroids and group ``nsample`` neighbors per centroid.

    Returns ``(new_xyz (B,S,3), new_points (B,S,K,3+D))`` where the grouped
    features are the neighbor coordinates *centered on the centroid*,
    concatenated with the neighbors' input features if given. This is the
    sampling+grouping stage of PointNet++ set abstraction
    (`models/pointnet_pp.py:27-37`).

    sampling: ``"random"`` (reference production path), ``"fps"`` (true FPS,
    reference demo path), or ``"first"`` (deterministic; for eval parity).
    grouping: ``"knn"`` (reference production path) or ``"ball"``
    (reference demo path, radius-filtered).
    neighbor_major: return grouped features as ``(B, K, S, 3+D)`` — the
    fused grouping kernel's native layout, consumed transpose-free by the
    fused MLP+max kernel.
    """
    B, N, _ = xyz.shape
    if sampling == "random":
        if key is None:
            raise ValueError("sampling='random' requires a PRNG key")
        fps_idx = random_sample_indices(key, B, N, npoint)
    elif sampling == "fps":
        fps_idx = farthest_point_sample(xyz, npoint, key)
    elif sampling == "first":
        fps_idx = jnp.broadcast_to(jnp.arange(npoint, dtype=jnp.int32)[None], (B, npoint))
    else:
        raise ValueError(f"unknown sampling mode: {sampling}")

    if grouping == "knn" and not _approx_eligible(N) and not _grid_eligible(N) \
            and _fused_group_eligible(N):
        # Fused SA grouping kernel: centroid gather + exact kNN + neighbor
        # gather (+ feature gather) + centering in ONE kernel per batch
        # element. Selection is K argmin passes at VPU issue rate; the
        # per-pass row extraction rides the MXU as a bit-exact one-hot
        # contraction, so it is free next to the selection — this removed
        # the 1.4 ms/step extraction overhead of the previous fused kernel
        # and the 1.3 ms XLA top_k+gather stage at sa2's shapes (B=64).
        from .pallas_kernels import sa_group_coords_pallas, sa_group_feats_pallas

        if points is None:
            new_xyz, grouped, _ = sa_group_coords_pallas(xyz, fps_idx, nsample)
        else:
            interp = jax.default_backend() != "tpu"
            new_xyz, grouped, _ = sa_group_feats_pallas(
                xyz, points, fps_idx, nsample, interp
            )
        if neighbor_major:
            # the kernel's native layout is (B,K,S,C); the wrapper's swap and
            # this one cancel at XLA level, so this is transpose-free
            grouped = jnp.swapaxes(grouped, 1, 2)
        return new_xyz, grouped

    new_xyz = index_points(xyz, fps_idx)  # (B,S,3)
    if grouping == "knn":
        idx = knn_query(new_xyz, xyz, nsample)
    elif grouping == "ball":
        idx = ball_query(radius, nsample, xyz, new_xyz)
    else:
        raise ValueError(f"unknown grouping mode: {grouping}")

    grouped_xyz = index_points(xyz, idx)  # (B,S,K,3)
    normed = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_pts = index_points(points, idx)  # (B,S,K,D)
        new_points = jnp.concatenate([normed, grouped_pts], axis=-1)
    else:
        new_points = normed
    if neighbor_major:
        new_points = jnp.swapaxes(new_points, 1, 2)
    return new_xyz, new_points


def group_all(
    xyz: jax.Array, points: Optional[jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Group the entire cloud into one set: ``(B,1,3), (B,1,N,3+D)``.

    Parity: the ``group_all`` branch of set abstraction
    (`models/pointnet_pp.py:23-26`) — note the reference does *not* center the
    coordinates in this branch and uses the raw ``xyz`` as features.
    """
    B = xyz.shape[0]
    new_xyz = jnp.zeros((B, 1, 3), dtype=xyz.dtype)
    grouped = xyz[:, None, :, :]  # (B,1,N,3)
    if points is not None:
        grouped = jnp.concatenate([grouped, points[:, None, :, :]], axis=-1)
    return new_xyz, grouped
