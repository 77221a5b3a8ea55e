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
# Gather via one-hot matmul (XLA's TPU gather/scatter are row-at-a-time slow)
# ---------------------------------------------------------------------------


def _gather_kernel(idx_ref, pts_ref, out_ref):
    """out[r, :] = pts[idx[r], :] as a one-hot contraction on the MXU.

    idx_ref: (TILE_R, 1) int32 VMEM; pts_ref: (N, C) VMEM;
    out_ref: (TILE_R, C) VMEM.
    """
    N = pts_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (idx_ref.shape[0], N), 1)
    onehot = (lane == idx_ref[:, :]).astype(jnp.float32)
    out_ref[:, :] = jax.lax.dot_general(
        onehot,
        pts_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _scatter_kernel(idx_ref, dout_ref, dpts_ref):
    """dpts[n, :] = sum_r (idx[r] == n) * dout[r, :] — the gather transpose,
    also one MXU contraction per tile.

    idx_ref: (R, 1) int32; dout_ref: (R, C); dpts_ref: (N, C) VMEM out.
    """
    R = idx_ref.shape[0]
    N = dpts_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    onehot = (lane == idx_ref[:, :]).astype(jnp.float32)  # (R, N)
    dpts_ref[:, :] = jax.lax.dot_general(
        onehot,
        dout_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract over R
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gather_fwd_impl(points: jax.Array, idx: jax.Array, interpret: bool):
    B, N, C = points.shape
    R = idx.shape[1]
    TILE_R = R if R <= 512 else 512
    if R % TILE_R:
        TILE_R = R  # fall back to one tile
    idx3 = idx.reshape(B, R, 1).astype(jnp.int32)
    return pl.pallas_call(
        _gather_kernel,
        grid=(B, R // TILE_R),
        in_specs=[
            pl.BlockSpec((None, TILE_R, 1), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, C), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, TILE_R, C), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(idx3, points.astype(jnp.float32))


def _scatter_impl(idx: jax.Array, dout: jax.Array, n: int, interpret: bool):
    B, R, C = dout.shape
    idx3 = idx.reshape(B, R, 1).astype(jnp.int32)
    return pl.pallas_call(
        _scatter_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, R, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, R, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(idx3, dout.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_pallas(points: jax.Array, idx: jax.Array, interpret: bool = False):
    """Batched row gather ``points (B,N,C)[idx (B,R)] -> (B,R,C)`` as one-hot
    MXU contractions, with the transpose (scatter-add) as its VJP — both
    orders of magnitude faster than XLA's row-at-a-time TPU gather/scatter
    for the SA grouping shapes.
    """
    return _gather_fwd_impl(points, idx, interpret)


def _gather_vjp_fwd(points, idx, interpret):
    # NB: in this jax version custom_vjp's fwd receives the ORIGINAL
    # argument order (nondiff args in place); bwd receives them first.
    return _gather_fwd_impl(points, idx, interpret), (idx, points.shape[1])


def _gather_vjp_bwd(interpret, res, g):
    idx, n = res
    return _scatter_impl(idx, g, n, interpret), None


gather_pallas.defvjp(_gather_vjp_fwd, _gather_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused kNN + gather + center: the sa1 hot path in one kernel
# ---------------------------------------------------------------------------


def _knn_gather_kernel(new_xyz_ref, xyz_ref, idx_ref, gx_ref, gy_ref, gz_ref,
                       dist_ref):
    """kNN selection that also emits the selected points' CENTERED
    coordinates, reusing each pass's one-hot mask for the extraction —
    the separate XLA gather (the most expensive single op in the sa1
    stage) disappears.

    new_xyz_ref: (S, 3); xyz_ref: (3, N); idx_ref: (S, K) int32 out;
    g{x,y,z}_ref: (S, K) f32 out (centered coords); dist_ref: (S, N) scratch.
    """
    S, N = dist_ref.shape
    K = idx_ref.shape[1]
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

    def body(j, _):
        d = dist_ref[:, :]
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)  # (S,)
        taken = col_ids == idx[:, None]  # (S, N) one-hot
        sel = jnp.where(out_cols == j, idx[:, None], idx_ref[:, :])
        idx_ref[:, :] = sel
        takenf = taken.astype(jnp.float32)
        for c, ref in enumerate((gx_ref, gy_ref, gz_ref)):
            coord = jnp.sum(takenf * xyz_ref[c, :][None, :], axis=1)  # (S,)
            centered = coord - new_xyz_ref[:, c]
            ref[:, :] = jnp.where(out_cols == j, centered[:, None], ref[:, :])
        dist_ref[:, :] = jnp.where(taken, jnp.inf, d)
        return 0

    jax.lax.fori_loop(0, K, body, 0)


@functools.partial(jax.jit, static_argnames=("nsample", "interpret"))
def knn_gather_pallas(
    new_xyz: jax.Array,
    xyz: jax.Array,
    nsample: int,
    interpret: bool | None = None,
):
    """Fused kNN + gather + center for coordinate-only grouping (sa1).

    Returns ``(idx (B,S,K) int32, centered (B,S,K,3) f32)`` where
    ``centered[b,s,k] = xyz[b, idx[b,s,k]] - new_xyz[b,s]`` — the exact
    sampling+grouping output of `models/pointnet_pp.py:30-32` without the
    separate gather. NOTE: not differentiable w.r.t. inputs (coordinates
    carry no parameters in this framework's models; gradients never reach
    them).
    """
    B, S, _ = new_xyz.shape
    N = xyz.shape[1]
    if interpret is None:
        interpret = _use_interpret()
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)

    idx, gx, gy, gz = pl.pallas_call(
        _knn_gather_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, S, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, S, nsample), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
            jax.ShapeDtypeStruct((B, S, nsample), jnp.float32),
            jax.ShapeDtypeStruct((B, S, nsample), jnp.float32),
            jax.ShapeDtypeStruct((B, S, nsample), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t)
    centered = jnp.stack([gx, gy, gz], axis=-1)
    return idx, centered
