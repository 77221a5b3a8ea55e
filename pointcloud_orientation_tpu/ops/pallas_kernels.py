"""Pallas TPU kernels for the irregular grouping ops.

Two kernels cover the ops BASELINE.json designates for Pallas (FPS and
kNN/ball-query grouping):

* :func:`fps_pallas` — the whole iterative farthest-point-sampling loop runs
  inside ONE kernel with the cloud and the running min-distance vector held
  in VMEM. The XLA formulation launches ``npoint`` dependent HBM-bound
  steps; here HBM is touched once per cloud.
* :func:`knn_pallas` — fused pairwise-distance + k-selection per batch
  element: the ``(S, N)`` distance tile lives only in VMEM, so the ``(B, S,
  N)`` distance tensor (82 MB at the reference's canonical B=16, S=128,
  N=10k) never hits HBM. Distances are exact-f32 VPU
  broadcasts (chunked); selection is K argmin+mask passes on the VPU.
  7.6x the XLA top_k formulation at the canonical shape.

Both return indices (no gradients flow through integer selection; the
surrounding gathers are differentiated by XLA as usual). CPU/interpret mode
is supported for testing; the public wrappers in :mod:`.geometry` pick the
kernel on TPU for large shapes and fall back to jnp elsewhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Farthest point sampling
# ---------------------------------------------------------------------------


def _fps_kernel(xyz_ref, seed_ref, out_ref, dist_ref):
    """One batch element per grid cell.

    xyz_ref:  (3, N) VMEM — coordinates, feature-major so N is the lane dim
    seed_ref: (1, 1) SMEM — initial farthest index
    out_ref:  (1, npoint) VMEM int32 — selected indices
    dist_ref: (1, N) VMEM f32 scratch — running min squared distance
    """
    n = xyz_ref.shape[1]
    npoint = out_ref.shape[1]
    dist_ref[:, :] = jnp.full((1, n), 1e10, jnp.float32)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, farthest):
        # masked full-row store (Mosaic forbids scalar stores to VMEM)
        out_ref[:, :] = jnp.where(out_cols == i, farthest, out_ref[:, :])
        # one-hot reduction instead of a dynamic lane-index load (Mosaic
        # requires 128-aligned dynamic indices on the lane dimension)
        onehot = (lane_ids == farthest).astype(jnp.float32)  # (1, N)
        centroid = jnp.sum(xyz_ref[:, :] * onehot, axis=1, keepdims=True)  # (3, 1)
        d = jnp.sum((xyz_ref[:, :] - centroid) ** 2, axis=0, keepdims=True)  # (1, N)
        new_dist = jnp.minimum(dist_ref[:, :], d)
        dist_ref[:, :] = new_dist
        return jnp.argmax(new_dist[0, :]).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, seed_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(
    xyz: jax.Array,
    npoint: int,
    seeds: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Farthest-point sampling; semantics of
    :func:`..ops.geometry.farthest_point_sample` (`PointNet++Demo.py:8-29`).

    Args:
      xyz: ``(B, N, 3)`` clouds.
      npoint: number of points to select.
      seeds: optional ``(B,)`` int32 initial indices (default 0).
    Returns ``(B, npoint)`` int32 indices.
    """
    B, N, _ = xyz.shape
    if interpret is None:
        interpret = _use_interpret()
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if seeds is None:
        seeds = jnp.zeros((B,), jnp.int32)
    seeds2d = seeds.reshape(B, 1, 1).astype(jnp.int32)

    out = pl.pallas_call(
        _fps_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
        interpret=interpret,
    )(xyz_t, seeds2d)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# kNN grouping
# ---------------------------------------------------------------------------


def _knn_kernel(new_xyz_ref, xyz_ref, out_ref, dist_ref):
    """One batch element per grid cell.

    new_xyz_ref: (S, 3) VMEM centroids
    xyz_ref:     (3, N) VMEM cloud (feature-major)
    out_ref:     (S, K) VMEM int32 neighbor indices
    dist_ref:    (S, N) VMEM f32 scratch — the fused distance tile
    """
    S, N = dist_ref.shape
    K = out_ref.shape[1]
    # exact f32 distances on the VPU: the contraction dim is only 3, and a
    # single-pass bf16 MXU dot here perturbs near-tie neighbor selection.
    # Chunked over lanes to keep temporaries inside the VMEM budget.
    CH = 2048
    for start in range(0, N, CH):
        size = min(CH, N - start)
        xs = xyz_ref[:, start : start + size]  # (3, size)
        d = jnp.zeros((S, size), jnp.float32)
        for c in range(3):
            diff = new_xyz_ref[:, c][:, None] - xs[c, :][None, :]
            d = d + diff * diff
        dist_ref[:, start : start + size] = d

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (S, N), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)

    def body(j, _):
        d = dist_ref[:, :]
        # NOTE argmin kept on purpose: min+tie-break-min wins in a selection-
        # only microbenchmark (profile_vpu_select.py: 1.53 vs 2.25 ms) but
        # LOSES end-to-end inside the real kernels (bench 18.0k vs 19.2k
        # clouds/s) — the interleaved stores/extraction hide argmin's cost.
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)  # (S,)
        out_ref[:, :] = jnp.where(out_cols == j, idx[:, None], out_ref[:, :])
        taken = col_ids == idx[:, None]
        dist_ref[:, :] = jnp.where(taken, jnp.inf, d)
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _ball_kernel(new_xyz_ref, xyz_ref, out_ref, dist_ref, radius_sq: float):
    """Radius ball query, one batch element per grid cell.

    Same layout as the kNN kernel; selection picks the ``nsample``
    within-radius points with the *smallest index* (pad with the first),
    matching `PointNet++Demo.py:49-70`.
    """
    S, N = dist_ref.shape
    K = out_ref.shape[1]
    CH = 2048
    for start in range(0, N, CH):
        size = min(CH, N - start)
        xs = xyz_ref[:, start : start + size]
        d = jnp.zeros((S, size), jnp.float32)
        for c in range(3):
            diff = new_xyz_ref[:, c][:, None] - xs[c, :][None, :]
            d = d + diff * diff
        dist_ref[:, start : start + size] = d

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (S, N), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
    # candidate index value: own index if within radius else sentinel N
    # (kept in the scratch as float to reuse the distance buffer)
    cand = jnp.where(dist_ref[:, :] <= radius_sq, col_ids, N)
    dist_ref[:, :] = cand.astype(jnp.float32)

    def body(j, _):
        cand_f = dist_ref[:, :]
        idx = jnp.min(cand_f, axis=1).astype(jnp.int32)  # smallest index
        out_ref[:, :] = jnp.where(out_cols == j, idx[:, None], out_ref[:, :])
        taken = col_ids == idx[:, None]
        dist_ref[:, :] = jnp.where(taken, float(N), cand_f)
        return 0

    jax.lax.fori_loop(0, K, body, 0)
    # pad-with-first semantics + clamp the all-empty case into range
    first = out_ref[:, 0][:, None]
    filled = jnp.where(out_ref[:, :] >= N, first, out_ref[:, :])
    out_ref[:, :] = jnp.clip(filled, 0, N - 1)


@functools.partial(jax.jit, static_argnames=("nsample", "radius", "interpret"))
def ball_query_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Radius ball query; semantics of :func:`..ops.geometry.ball_query`.

    Returns ``(B, S, nsample)`` int32.
    """
    B, S, _ = new_xyz.shape
    N = xyz.shape[1]
    if interpret is None:
        interpret = _use_interpret()
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)

    kernel = functools.partial(_ball_kernel, radius_sq=float(radius) ** 2)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, S, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, S, nsample), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t)


@functools.partial(jax.jit, static_argnames=("nsample", "interpret"))
def knn_pallas(
    new_xyz: jax.Array,
    xyz: jax.Array,
    nsample: int,
    interpret: bool | None = None,
) -> jax.Array:
    """kNN neighbor indices; semantics of :func:`..ops.geometry.knn_query`
    (`models/base.py:29-35`), with the neighbor axis ordered nearest-first.

    Args:
      new_xyz: ``(B, S, 3)`` centroids.
      xyz: ``(B, N, 3)`` cloud.
    Returns ``(B, S, nsample)`` int32.
    """
    B, S, _ = new_xyz.shape
    N = xyz.shape[1]
    if interpret is None:
        interpret = _use_interpret()
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)

    return pl.pallas_call(
        _knn_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, S, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, S, nsample), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t)


# ---------------------------------------------------------------------------
# Fused kNN + gather + center: the sa1 hot path in one kernel
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Fused SA grouping: distance -> kNN select -> gather -> center, with the
# per-pass neighbor extraction on the MXU (one-hot contraction)
# ---------------------------------------------------------------------------


def _select_passes(dist_ref, idx_ref, lane_n, K: int) -> None:
    """K exact first-min selection passes over the (S, N) VMEM distance tile,
    writing nearest-first indices to ``idx_ref`` (K, S) and consuming
    ``dist_ref`` (taken lanes end up +inf; the final pass's mask store is
    skipped — nothing reads the tile afterwards).

    The formulation is chosen at TRACE time by ``PCOT_SA_SELECT``
    (benchmarking knob; every variant selects the identical indices,
    first-occurrence tie-break, so parity tests hold under any value).
    All variants MEASURED in-situ via bench.py on v5e (RESULTS.md
    k-selection item 4) — the non-default ones are kept as executable
    records of the negative results:

    * ``argmin`` (default, **21,194 clouds/s**) — one argmin + one masked
      store per pass. Threshold counting, min+tie-break and bf16 keys were
      already measured and rejected earlier (RESULTS.md k-selection 1-3).
    * ``multiG`` (``multi2`` 20,830 / ``multi4`` 20,901) — G selections per
      mask store: within a group the j-th argmin masks the j prior winners
      on the fly, then one store evicts the whole group. Loses: Mosaic
      materializes each masked temp, so the saved stores cost more than
      they buy.
    * ``chunk`` (15,726) — the hierarchical formulation of VERDICT r2
      item 2: per-pass argmin within 128-lane chunks, then a merge argmin
      over the (S, N/128) chunk minima. Loses big: same compare work but
      8x the intra-vreg lane-reduction work, plus merge overhead.
    """
    sel = os.environ.get("PCOT_SA_SELECT", "argmin")
    S, N = dist_ref.shape
    if sel.startswith("multi"):
        G = max(1, int(sel[5:] or "4"))
        for k0 in range(0, K, G):
            g = min(G, K - k0)
            d = dist_ref[:, :]
            for j in range(g):
                col = jnp.argmin(d, axis=1).astype(jnp.int32)
                idx_ref[k0 + j, :] = col
                if j + 1 < g or k0 + g < K:
                    d = jnp.where(lane_n == col[:, None], jnp.inf, d)
            if k0 + g < K:
                dist_ref[:, :] = d
        return
    if sel == "chunk" and N % 128 == 0 and N > 128:
        n_ch = N // 128
        for k in range(K):
            d3 = dist_ref[:, :].reshape(S, n_ch, 128)
            cmin = jnp.min(d3, axis=2)  # (S, n_ch)
            carg = jnp.argmin(d3, axis=2).astype(jnp.int32)
            w = jnp.argmin(cmin, axis=1).astype(jnp.int32)  # (S,)
            woh = (
                jax.lax.broadcasted_iota(jnp.int32, (S, n_ch), 1) == w[:, None]
            )
            lane_in = jnp.sum(jnp.where(woh, carg, 0), axis=1).astype(jnp.int32)
            col = w * 128 + lane_in
            idx_ref[k, :] = col
            if k + 1 < K:
                dist_ref[:, :] = jnp.where(
                    lane_n == col[:, None], jnp.inf, dist_ref[:, :]
                )
        return
    for k in range(K):
        d = dist_ref[:, :]
        col = jnp.argmin(d, axis=1).astype(jnp.int32)  # (S,) first-min
        idx_ref[k, :] = col
        if k + 1 < K:  # the last pass's eviction is dead — skip the store
            dist_ref[:, :] = jnp.where(lane_n == col[:, None], jnp.inf, d)


def _sa_group_kernel(cidx_ref, xyz_t_ref, pts_ref, newxyz_ref, grouped_ref,
                     idx_ref, dist_ref, *, K: int):
    """One batch element per grid cell. The set-abstraction grouping stage of
    `models/pointnet_pp.py:27-37` in one kernel: centroid extraction, exact
    pairwise distances (same -2ab+a^2+b^2 HIGHEST-f32 formula as
    :func:`..ops.geometry.square_distance`, so ties break identically to the
    XLA path), K argmin selection passes, and per-pass neighbor-row
    extraction as a one-hot MXU contraction — bit-exact, because HIGHEST
    decomposes each f32 into three disjoint-mantissa bf16 terms and the
    one-hot weights are exactly 1.

    cidx_ref:    (S, 1) int32 VMEM — centroid indices
    xyz_t_ref:   (3, N) f32 VMEM — coordinates, feature-major
    pts_ref:     (N, C) f32 VMEM — [xyz | feats] rows (C = 3 + D)
    newxyz_ref:  (S, 3) f32 out — centroid coordinates
    grouped_ref: (K, S, C) f32 out — slot k = k-th nearest row, coords
                 centered on the centroid (neighbor-major so each pass does
                 one contiguous static-index store)
    idx_ref:     (K, S) int32 out — selected indices, nearest first
    dist_ref:    (S, N) f32 scratch
    """
    S = newxyz_ref.shape[0]
    N = pts_ref.shape[0]
    C = pts_ref.shape[1]

    lane_n = jax.lax.broadcasted_iota(jnp.int32, (S, N), 1)

    # centroid rows via one-hot MXU extraction
    coh = (lane_n == cidx_ref[:, :]).astype(jnp.float32)  # (S, N)
    new_xyz = jax.lax.dot_general(
        coh,
        pts_ref[:, 0:3],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (S, 3)
    newxyz_ref[:, :] = new_xyz

    # exact distances, MXU cross term (same formula/precision as the XLA path)
    cross = jax.lax.dot_general(
        new_xyz,
        xyz_t_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (S, N)
    x2 = jnp.sum(xyz_t_ref[:, :] * xyz_t_ref[:, :], axis=0, keepdims=True)  # (1,N)
    c2 = jnp.sum(new_xyz * new_xyz, axis=1, keepdims=True)  # (S,1)
    dist_ref[:, :] = c2 - 2.0 * cross + x2

    # Exact 3-term bf16 split of the VALUE operand, once per cell: pts =
    # hi + mid + lo bitwise (8+8+8 mantissa bits, disjoint ranges, each
    # residual exact by Sterbenz). The per-pass extraction then runs as
    # cheap DEFAULT-precision bf16 MXU dots — the one-hot side is exactly
    # representable in bf16, so the gather stays bit-exact without paying
    # HIGHEST's per-pass decomposition of the big (S, N) operand.
    pts = pts_ref[:, :]
    hi = pts.astype(jnp.bfloat16)
    r1 = pts - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def _extract(onehot_bf16, v):
        return jax.lax.dot_general(
            onehot_bf16,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # NOTE: PCOT_SA_DEFER / PCOT_SA_SELECT are read at TRACE time — flipping
    # them after a jitted program is compiled/cached has no effect (set
    # before first call or clear jit caches when A/B benchmarking).
    if os.environ.get("PCOT_SA_DEFER", "1") != "0":
        # DEFAULT: lean selection passes (indices only), then ONE batched
        # one-hot contraction for all K x S rows — fewer op boundaries
        # inside the loop, bigger MXU invocations after it. Measured on
        # v5e at the bench shape: 21,267 vs 19,187 clouds/s (+11%) over
        # the per-pass interleaved extraction below (PCOT_SA_DEFER=0).
        _select_passes(dist_ref, idx_ref, lane_n, K)
        vals = jnp.concatenate([hi, mid, lo], axis=1)  # (N, 3C) bf16
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (K, S, N), 2)
        oh = (lane3 == idx_ref[:, :][:, :, None]).astype(jnp.bfloat16)
        rows3 = jax.lax.dot_general(
            oh,
            vals,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, S, 3C)
        row = rows3[:, :, 0:C] + rows3[:, :, C : 2 * C] + rows3[:, :, 2 * C :]
        centered = row[:, :, 0:3] - new_xyz[None, :, :]
        if C > 3:
            grouped_ref[:, :, :] = jnp.concatenate(
                [centered, row[:, :, 3:]], axis=2
            )
        else:
            grouped_ref[:, :, :] = centered
        return

    for k in range(K):  # static unroll: every store has a static index
        d = dist_ref[:, :]
        # argmin kept: wins end-to-end vs min+tie-break (see _knn_kernel note)
        col = jnp.argmin(d, axis=1).astype(jnp.int32)  # (S,) first-min
        idx_ref[k, :] = col
        taken = lane_n == col[:, None]  # (S, N) exact one-hot
        t = taken.astype(jnp.bfloat16)
        row = _extract(t, hi) + _extract(t, mid) + _extract(t, lo)  # (S, C)
        centered = row[:, 0:3] - new_xyz
        if C > 3:
            grouped_ref[k, :, :] = jnp.concatenate([centered, row[:, 3:]], axis=1)
        else:
            grouped_ref[k, :, :] = centered
        dist_ref[:, :] = jnp.where(taken, jnp.inf, d)


def _sa_group_call(pts: jax.Array, cidx: jax.Array, nsample: int,
                   interpret: bool):
    """pts: (B, N, 3+D) f32 rows = [xyz | feats]; cidx: (B, S) int32.

    Returns (new_xyz (B,S,3), grouped (B,S,K,3+D), idx (B,S,K))."""
    B, N, C = pts.shape
    S = cidx.shape[1]
    K = nsample
    xyz_t = jnp.swapaxes(pts[:, :, :3], 1, 2)  # (B, 3, N)
    cidx3 = cidx.reshape(B, S, 1).astype(jnp.int32)

    kernel = functools.partial(_sa_group_kernel, K=K)
    new_xyz, grouped, idx = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, S, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, S, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K, S, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, K, S, C), jnp.float32),
            jax.ShapeDtypeStruct((B, K, S), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cidx3, xyz_t, pts.astype(jnp.float32))
    return new_xyz, jnp.swapaxes(grouped, 1, 2), jnp.swapaxes(idx, 1, 2)


def _sa_scatter_kernel(idx_ref, dg_ref, dfeat_ref, *, K: int):
    """Transpose of the fused grouping's feature gather: scatter-add each
    neighbor-slot cotangent back to its source row, one transposed one-hot
    MXU contraction per slot.

    idx_ref: (K, S) int32; dg_ref: (K, S, D); dfeat_ref: (N, D) f32 out.
    """
    S = idx_ref.shape[1]
    N, D = dfeat_ref.shape
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (S, N), 1)
    acc = jnp.zeros((N, D), jnp.float32)
    for k in range(K):
        col = idx_ref[k, :]  # (S,)
        oh = (lane_n == col[:, None]).astype(jnp.float32)  # (S, N)
        acc = acc + jax.lax.dot_general(
            oh,
            dg_ref[k, :, :],
            dimension_numbers=(((0,), (0,)), ((), ())),  # contract S
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    dfeat_ref[:, :] = acc


def _sa_scatter_call(idx: jax.Array, dg: jax.Array, n: int, interpret: bool):
    """idx: (B,S,K); dg: (B,S,K,D) cotangents -> (B,n,D) scatter-add."""
    B, S, K = idx.shape
    D = dg.shape[-1]
    idx_t = jnp.swapaxes(idx, 1, 2)  # (B, K, S)
    dg_t = jnp.swapaxes(dg, 1, 2)  # (B, K, S, D)
    kernel = functools.partial(_sa_scatter_kernel, K=K)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, K, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K, S, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx_t, dg_t.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("nsample", "interpret"))
def sa_group_coords_pallas(
    xyz: jax.Array,
    cidx: jax.Array,
    nsample: int,
    interpret: bool | None = None,
):
    """Fused SA grouping for the coordinate-only stage (sa1): centroid
    gather + exact kNN + neighbor gather + centering in one kernel.

    Returns ``(new_xyz (B,S,3), grouped (B,S,K,3), idx (B,S,K))`` matching
    `models/pointnet_pp.py:27-37` (kNN semantics of `models/base.py:29-35`).
    NOT differentiable (coordinates carry no parameters in these models).
    """
    if interpret is None:
        interpret = _use_interpret()
    return _sa_group_call(xyz.astype(jnp.float32), cidx, nsample, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sa_group_feats_pallas(
    xyz: jax.Array,
    feats: jax.Array,
    cidx: jax.Array,
    nsample: int,
    interpret: bool = False,
):
    """Fused SA grouping with features (sa2): centroid gather + exact kNN +
    joint [coords|feats] neighbor gather + coordinate centering in one
    kernel; the feature gather's VJP is the transposed one-hot scatter-add
    (also a Pallas kernel). Coordinates receive zero cotangents — they carry
    no parameters in these models.

    Returns ``(new_xyz (B,S,3), grouped (B,S,K,3+D), idx (B,S,K))``.
    """
    pts = jnp.concatenate([xyz.astype(jnp.float32), feats.astype(jnp.float32)], -1)
    return _sa_group_call(pts, cidx, nsample, interpret)


def _sa_group_feats_fwd(xyz, feats, cidx, nsample, interpret):
    pts = jnp.concatenate([xyz.astype(jnp.float32), feats.astype(jnp.float32)], -1)
    out = _sa_group_call(pts, cidx, nsample, interpret)
    new_xyz, grouped, idx = out
    # dtype carriers: dtypes themselves are not valid pytree leaves
    xyz_proto = jnp.zeros((0,), xyz.dtype)
    feats_proto = jnp.zeros((0,), feats.dtype)
    return out, (idx, xyz.shape, xyz_proto, feats.shape, feats_proto, cidx.shape)


def _sa_group_feats_bwd(nsample, interpret, res, g):
    import numpy as _np

    idx, xyz_shape, xyz_proto, feats_shape, feats_proto, cidx_shape = res
    _, dgrouped, _ = g  # cotangents for (new_xyz, grouped, idx)
    dfeats = _sa_scatter_call(idx, dgrouped[..., 3:], feats_shape[1], interpret)
    dxyz = jnp.zeros(xyz_shape, xyz_proto.dtype)
    dcidx = _np.zeros(cidx_shape, dtype=jax.dtypes.float0)
    return dxyz, dfeats.astype(feats_proto.dtype), dcidx


sa_group_feats_pallas.defvjp(_sa_group_feats_fwd, _sa_group_feats_bwd)


# ---------------------------------------------------------------------------
# Fused shared-MLP + max-pool: the compute stage of set abstraction
# (`models/pointnet_pp.py:39-43`) as ONE kernel over the grouped tensor.
# BatchNorm is pre-folded into per-layer (scale, shift) by the caller
# (running stats in eval; differentiable ghost stats in train — see
# models/layers.py), so the kernel is pure matmul/affine/relu/max work and
# no per-layer activation ever leaves VMEM.
# ---------------------------------------------------------------------------


def _sa_mlp_fwd_compute(g_ref, layer_refs, *, bf16: bool):
    """Shared forward recompute: returns (acts, pooled) where acts[l] is the
    post-relu activation of layer l as a (K*S, C_l) array. g_ref block is
    (K, S, C) neighbor-major (the fused grouping kernel's native layout)."""
    K, S, C = g_ref.shape
    x = g_ref[:, :, :].reshape(K * S, C)
    pre, post = [], []
    for w_ref, s_ref, t_ref in layer_refs:
        w = w_ref[:, :]
        if bf16:
            z = jax.lax.dot_general(
                x.astype(jnp.bfloat16),
                w.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            z = jax.lax.dot_general(
                x,
                w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        y = z * s_ref[0, :][None, :] + t_ref[0, :][None, :]
        x = jnp.maximum(y, 0.0)
        pre.append((z, y))
        post.append(x)
    pooled = jnp.max(post[-1].reshape(K, S, post[-1].shape[-1]), axis=0)
    return pre, post, pooled


def _sa_mlp_max_fwd_kernel(*refs, n_layers: int, bf16: bool):
    g_ref = refs[0]
    layer_refs = [tuple(refs[1 + 3 * l : 4 + 3 * l]) for l in range(n_layers)]
    out_ref = refs[1 + 3 * n_layers]
    _, _, pooled = _sa_mlp_fwd_compute(g_ref, layer_refs, bf16=bf16)
    out_ref[:, :] = pooled


def _sa_mlp_max_bwd_kernel(*refs, n_layers: int, bf16: bool):
    """Recompute-in-VMEM backward. Inputs: grouped, (w,s,t)*L, dpooled.
    Outputs: dgrouped (K,S,C) and per-cell partials dw_l (Cin,Cout),
    ds_l (1,Cout), dt_l (1,Cout) — summed over the batch grid by the caller.

    Max-pool ties split the cotangent evenly (jnp.max VJP semantics, so
    gradients match the unfused XLA path bitwise-modulo-matmul-order)."""
    g_ref = refs[0]
    layer_refs = [tuple(refs[1 + 3 * l : 4 + 3 * l]) for l in range(n_layers)]
    dpool_ref = refs[1 + 3 * n_layers]
    dg_ref = refs[2 + 3 * n_layers]
    grad_refs = [
        tuple(refs[3 + 3 * n_layers + 3 * l : 6 + 3 * n_layers + 3 * l])
        for l in range(n_layers)
    ]

    K, S, C = g_ref.shape
    pre, post, pooled = _sa_mlp_fwd_compute(g_ref, layer_refs, bf16=bf16)

    a_last = post[-1].reshape(K, S, post[-1].shape[-1])
    ties = (a_last == pooled[None, :, :]).astype(jnp.float32)
    cnt = jnp.sum(ties, axis=0, keepdims=True)
    da = ties * (dpool_ref[:, :] / cnt[0])[None, :, :]
    da = da.reshape(K * S, a_last.shape[-1])

    def mm(a, b, contract):
        if bf16:
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16),
                b.astype(jnp.bfloat16),
                dimension_numbers=(contract, ((), ())),
                preferred_element_type=jnp.float32,
            )
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    for l in range(n_layers - 1, -1, -1):
        z, y = pre[l]
        w_ref, s_ref, _ = layer_refs[l]
        dw_ref, ds_ref, dt_ref = grad_refs[l]
        dy = da * (y > 0.0).astype(jnp.float32)
        ds_ref[0, :] = jnp.sum(dy * z, axis=0)
        dt_ref[0, :] = jnp.sum(dy, axis=0)
        dz = dy * s_ref[0, :][None, :]
        a_in = post[l - 1] if l > 0 else g_ref[:, :, :].reshape(K * S, C)
        dw_ref[:, :] = mm(a_in, dz, ((0,), (0,)))  # (Cin, Cout)
        da = mm(dz, w_ref[:, :], ((1,), (1,)))  # (rows, Cin)
    dg_ref[:, :, :] = da.reshape(K, S, C)


def _replicated_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)


def _sa_mlp_layer_inputs(layers):
    """Flatten [(W, scale, shift), ...] into kernel inputs with scale/shift
    reshaped to (1, C) rows, plus their specs."""
    arrs, specs = [], []
    for w, s, t in layers:
        arrs += [w.astype(jnp.float32), s.reshape(1, -1).astype(jnp.float32),
                 t.reshape(1, -1).astype(jnp.float32)]
        specs += [_replicated_spec(w.shape), _replicated_spec((1, w.shape[1])),
                  _replicated_spec((1, w.shape[1]))]
    return arrs, specs


def _sa_mlp_max_fwd_impl(grouped, layers, bf16, interpret):
    B, K, S, C = grouped.shape
    n_layers = len(layers)
    c_out = layers[-1][0].shape[1]
    layer_arrs, layer_specs = _sa_mlp_layer_inputs(layers)
    kernel = functools.partial(
        _sa_mlp_max_fwd_kernel, n_layers=n_layers, bf16=bf16
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, K, S, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((None, S, c_out), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, c_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(grouped.astype(jnp.float32), *layer_arrs)


def _sa_mlp_max_bwd_impl(grouped, layers, dpooled, bf16, interpret):
    B, K, S, C = grouped.shape
    n_layers = len(layers)
    layer_arrs, layer_specs = _sa_mlp_layer_inputs(layers)
    kernel = functools.partial(
        _sa_mlp_max_bwd_kernel, n_layers=n_layers, bf16=bf16
    )
    out_specs = [
        pl.BlockSpec((None, K, S, C), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shapes = [jax.ShapeDtypeStruct((B, K, S, C), jnp.float32)]
    for w, _, _ in layers:
        cin, cout = w.shape
        out_specs += [
            pl.BlockSpec((None, cin, cout), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, cout), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, cout), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((B, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, cout), jnp.float32),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, K, S, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *layer_specs,
            pl.BlockSpec((None, S, layers[-1][0].shape[1]),
                         lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(grouped.astype(jnp.float32), *layer_arrs, dpooled.astype(jnp.float32))
    dgrouped = outs[0]
    dlayers = []
    for l in range(n_layers):
        dw = jnp.sum(outs[1 + 3 * l], axis=0)
        ds = jnp.sum(outs[2 + 3 * l], axis=0)[0]
        dt = jnp.sum(outs[3 + 3 * l], axis=0)[0]
        dlayers.append((dw, ds, dt))
    return dgrouped, dlayers


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sa_mlp_max_pallas(grouped, layers, bf16: bool = False,
                      interpret: bool = False):
    """Fused shared-MLP + neighbor max-pool (`models/pointnet_pp.py:39-43`).

    Args:
      grouped: ``(B, K, S, C)`` neighbor-major grouped features (the fused
        grouping kernel's native layout).
      layers: list of ``(W (Cin,Cout), scale (Cout,), shift (Cout,))`` with
        Dense bias and BatchNorm pre-folded into scale/shift: each layer
        computes ``relu((x @ W) * scale + shift)``.
      bf16: run the matmuls as bf16 MXU passes with f32 accumulation
        (matching ``nn.Dense(dtype=bfloat16)``); else exact HIGHEST f32.

    Returns ``(B, S, C_last)`` f32. Differentiable in grouped and layers
    (recompute-in-VMEM backward; max ties split evenly like jnp.max).
    """
    return _sa_mlp_max_fwd_impl(grouped, layers, bf16, interpret)


def _sa_mlp_max_vjp_fwd(grouped, layers, bf16, interpret):
    out = _sa_mlp_max_fwd_impl(grouped, layers, bf16, interpret)
    return out, (grouped, layers)


def _sa_mlp_max_vjp_bwd(bf16, interpret, res, g):
    grouped, layers = res
    dgrouped, dlayers = _sa_mlp_max_bwd_impl(grouped, layers, g, bf16, interpret)
    return dgrouped, dlayers


sa_mlp_max_pallas.defvjp(_sa_mlp_max_vjp_fwd, _sa_mlp_max_vjp_bwd)


# ---------------------------------------------------------------------------
# K-smallest selection over a precomputed candidate-distance tile: the
# rescore stage of the exact grid-pruned kNN
# (`ops/geometry.py::_grid_pruned_knn`). Same argmin-pass formulation (and
# first-occurrence tie-break) as the fused SA kernel's `_select_passes` —
# just decoupled from the distance compute, because the grid path's
# candidate sets are per-centroid gathers XLA produces more cheaply.
# ---------------------------------------------------------------------------


def _topk_min_kernel(d_in_ref, idx_ref, dist_ref, *, K: int):
    """One batch element per grid cell.

    d_in_ref: (S, M) VMEM f32 candidate distances (+inf = invalid slot)
    idx_ref:  (S, K) VMEM int32 positions of the K smallest, nearest-first
    dist_ref: (S, M) VMEM f32 scratch (consumed by the eviction passes)
    """
    S, M = d_in_ref.shape
    dist_ref[:, :] = d_in_ref[:, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
    for k in range(K):
        d = dist_ref[:, :]
        col = jnp.argmin(d, axis=1).astype(jnp.int32)  # (S,) first-min
        idx_ref[:, :] = jnp.where(out_cols == k, col[:, None], idx_ref[:, :])
        if k + 1 < K:  # final eviction is dead — skip the store
            dist_ref[:, :] = jnp.where(lane == col[:, None], jnp.inf, d)


@functools.partial(jax.jit, static_argnames=("nsample", "interpret"))
def topk_min_pallas(
    d: jax.Array, nsample: int, interpret: bool | None = None
) -> jax.Array:
    """Positions of the ``nsample`` smallest entries of ``d (B, S, M)``
    along the last axis, nearest-first (first-occurrence tie-break).
    Returns ``(B, S, nsample)`` int32."""
    B, S, M = d.shape
    if interpret is None:
        interpret = _use_interpret()
    return pl.pallas_call(
        functools.partial(_topk_min_kernel, K=nsample),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, S, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, S, nsample), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(d.astype(jnp.float32))
