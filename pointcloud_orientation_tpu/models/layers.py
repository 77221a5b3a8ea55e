"""Shared building blocks: pointwise MLPs and PointNet++ set abstraction.

TPU-first design notes
----------------------
* A torch ``Conv2d(C_in, C_out, 1)`` over ``(B, C, S, K)`` is exactly a dense
  layer over the trailing feature axis of ``(B, S, K, C)``; we keep tensors
  feature-last so every MLP is a single large MXU matmul and XLA fuses the
  bias/norm/ReLU into it.
* Set abstraction = sample -> group (gather) -> shared MLP -> max over the
  neighbor axis. Grouping stays in XLA (top_k + gather); the MLP/max is pure
  MXU work. Parity: ``PointNetSetAbstraction`` (`models/pointnet_pp.py:6-43`)
  and the radius-query demo variant (`PointNet++Demo.py:74-173`).
* BatchNorm statistics are per-device-batch, matching the reference's
  single-device BN at batch 16 (SURVEY.md §7 hard part 4); under data
  parallelism each shard normalizes locally unless ``axis_name`` is given.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import geometry as G


class SharedMLP(nn.Module):
    """Stack of pointwise Dense + Norm + ReLU layers over the last axis.

    Equivalent to the reference's 1x1 ``Conv2d`` + ``BatchNorm2d`` + ReLU
    stacks (`models/pointnet_pp.py:14-19,39-41`).

    ``fuse_max=True`` switches to the fused Pallas path: the input must then
    be the *neighbor-major* grouped tensor ``(B, K, S, C)`` and the return
    value is the max-pooled ``(B, S, C_out)`` — MLP and neighbor max-pool run
    as one kernel with BatchNorm pre-folded into per-layer scale/shift
    (running stats in eval — bitwise the same normalization as the unfused
    path; differentiable ghost stats over a 1/``ghost_stride`` neighbor
    subsample in train, the VERDICT-sanctioned ghost-BN design). The param
    tree is identical to the unfused module, so checkpoints and torch
    imports are interchangeable.
    """

    channels: Sequence[int]
    norm: str = "batch"  # "batch" | "layer" | "none"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None  # computation dtype (e.g. bfloat16)
    fuse_max: bool = False
    ghost_stride: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.fuse_max:
            return self._fused_max(x, train)
        for ch in self.channels:
            x = nn.Dense(ch, dtype=self.dtype)(x)
            if self.norm == "batch":
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=self.bn_axis_name,
                    dtype=self.dtype,
                )(x)
            elif self.norm == "layer":
                x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        return x

    def _fused_max(self, grouped: jax.Array, train: bool) -> jax.Array:
        """grouped: (B, K, S, C) -> pooled (B, S, C_out) via
        :func:`..ops.pallas_kernels.sa_mlp_max_pallas`."""
        from ..ops.pallas_kernels import sa_mlp_max_pallas

        assert self.norm == "batch", "fused SA MLP requires BatchNorm"
        assert self.bn_axis_name is None, "fused SA MLP is per-device BN only"
        eps = 1e-5
        # ghost rows: every ghost_stride-th neighbor slot in train (stats over
        # batch x centroids x K/stride neighbors); a single row in eval, where
        # the BN calls only register params and running stats carry the fold.
        if train:
            g = grouped[:, :: self.ghost_stride]
        else:
            g = grouped[:, :1, :1]
        layers = []
        for i, ch in enumerate(self.channels):
            dense = nn.Dense(ch, dtype=self.dtype, name=f"Dense_{i}")
            zg = dense(g)
            bn = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=eps,
                dtype=self.dtype,
                name=f"BatchNorm_{i}",
            )
            g = nn.relu(bn(zg))
            dp = self.get_variable("params", f"Dense_{i}")
            bp = self.get_variable("params", f"BatchNorm_{i}")
            if train:
                zf = zg.astype(jnp.float32)
                mu = jnp.mean(zf, axis=(0, 1, 2))
                var = jnp.mean(zf * zf, axis=(0, 1, 2)) - mu * mu
            else:
                st = self.get_variable("batch_stats", f"BatchNorm_{i}")
                mu, var = st["mean"], st["var"]
            s = bp["scale"] * jax.lax.rsqrt(var + eps)
            t = (dp["bias"] - mu) * s + bp["bias"]
            layers.append((dp["kernel"], s, t))
        bf16 = self.dtype == jnp.bfloat16
        interpret = jax.default_backend() != "tpu"
        return sa_mlp_max_pallas(grouped, layers, bf16, interpret)


class SetAbstraction(nn.Module):
    """PointNet++ set abstraction: sample centroids, group neighbors,
    run a shared MLP, max-pool over the neighborhood.

    ``sampling``:
      * ``"random"`` — per-sample random centroid choice, the reference's
        production path (`models/pointnet_pp.py:28`); draws from the
        ``"sampling"`` RNG collection when available, else falls back to
        ``"first"`` (deterministic).
      * ``"fps"`` — true farthest-point sampling (`PointNet++Demo.py:8-29`).
      * ``"first"`` — take the first ``npoint`` points (deterministic eval).

    ``grouping``: ``"knn"`` (reference production, `models/base.py:29-35`) or
    ``"ball"`` (radius query with pad-with-first, `PointNet++Demo.py:49-70`).

    ``group_all=True`` pools the whole cloud with *uncentered* coordinates,
    matching `models/pointnet_pp.py:23-26`.
    """

    npoint: Optional[int]
    nsample: Optional[int]
    mlp_channels: Sequence[int]
    group_all: bool = False
    sampling: str = "random"
    grouping: str = "knn"
    radius: float = 0.2
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: Optional[jax.Array],
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        # Fused compute stage: shared-MLP + neighbor max-pool as one Pallas
        # kernel over the neighbor-major grouped tensor (no per-layer
        # activation traffic). Per-device BatchNorm only; the param tree is
        # identical either way (see SharedMLP.fuse_max). Measured A/B at the
        # bench shape (benchmarks/profile_ab_modes.py, B=64 N=1024 bf16):
        # the fused kernel wins in eval (running-stats BN folds exactly)
        # but LOSES in train (ghost-stats side pass + recompute backward:
        # 3.01 vs 2.78 ms/step), so dispatch is eval-only by default —
        # which also keeps train-mode BatchNorm statistics bitwise-exact
        # reference semantics. PCOT_FUSED_MLP=1 forces it on in train.
        fused_mlp = G.fused_mlp_eligible(train) and self.bn_axis_name is None
        if self.group_all:
            new_xyz, grouped = G.group_all(xyz, points)
            if fused_mlp:
                grouped = jnp.swapaxes(grouped, 1, 2)  # (B, N, 1, C)
        else:
            sampling = self.sampling
            key = None
            if sampling == "random":
                if self.has_rng("sampling"):
                    key = self.make_rng("sampling")
                else:
                    sampling = "first"
            elif sampling == "fps" and self.has_rng("sampling"):
                key = self.make_rng("sampling")
            new_xyz, grouped = G.sample_and_group(
                xyz,
                points,
                self.npoint,
                self.nsample,
                key=key,
                sampling=sampling,
                grouping=self.grouping,
                radius=self.radius,
                neighbor_major=fused_mlp,
            )
        mlp = SharedMLP(
            self.mlp_channels,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            fuse_max=fused_mlp,
            name="SharedMLP_0",
        )
        if fused_mlp:
            return new_xyz, mlp(grouped, train=train)
        feats = mlp(grouped, train=train)
        pooled = jnp.max(feats, axis=2)  # (B, S, C_out)
        return new_xyz, pooled


class PointNetPPTrunk(nn.Module):
    """The backbone every PointNet++ variant shares: three SA stages and a
    two-layer FC funnel to a 256-d global feature.

    sa1 = SA(128, 32, [64, 64, 128]); sa2 = SA(32, 32, [128, 128, 256]);
    sa3 = SA(group_all, [256, 512, 1024]); fc 1024->512->256 with norm, ReLU
    and dropout. Parity: `models/pointnet_pp.py:48-57` (BatchNorm trunk,
    dropout once after fc2) and `models/pointnet_pp_mvM.py:57-61,75-84`
    (LayerNorm trunk, dropout after each fc).
    """

    fc_norm: str = "batch"  # norm used in the FC funnel ("batch" | "layer")
    p_drop: float = 0.5
    drop_each_fc: bool = False  # MvM style: dropout after fc1 AND fc2
    sampling: str = "random"
    grouping: str = "knn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None  # trunk computation dtype; the
    # geometry (distances, neighbor selection) always runs f32 and the
    # 256-d output feature is cast back to f32 for the heads

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        sa_kwargs = dict(
            sampling=self.sampling,
            grouping=self.grouping,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        l1_xyz, l1_pts = SetAbstraction(128, 32, (64, 64, 128), **sa_kwargs)(
            xyz, None, train=train
        )
        l2_xyz, l2_pts = SetAbstraction(32, 32, (128, 128, 256), **sa_kwargs)(
            l1_xyz, l1_pts, train=train
        )
        _, l3_pts = SetAbstraction(
            None, None, (256, 512, 1024), group_all=True, **sa_kwargs
        )(l2_xyz, l2_pts, train=train)
        x = l3_pts.reshape(xyz.shape[0], -1)  # (B, 1024)

        def _norm():
            if self.fc_norm == "batch":
                return nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=self.bn_axis_name,
                    dtype=self.dtype,
                )
            return nn.LayerNorm(dtype=self.dtype)

        x = nn.relu(_norm()(nn.Dense(512, dtype=self.dtype)(x)))
        if self.drop_each_fc:
            x = nn.Dropout(self.p_drop)(x, deterministic=not train)
        x = nn.relu(_norm()(nn.Dense(256, dtype=self.dtype)(x)))
        x = nn.Dropout(self.p_drop)(x, deterministic=not train)
        return x.astype(jnp.float32)
