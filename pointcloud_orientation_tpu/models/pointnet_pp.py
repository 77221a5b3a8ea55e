"""PointNet++ orientation models: one shared trunk, many heads.

The reference ships five byte-identical copies of the backbone and differs
only in the head (SURVEY.md §2.2); here the trunk is
:class:`~.layers.PointNetPPTrunk` and each model is a thin head module.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import PointNetPPTrunk, SetAbstraction


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch ``F.normalize`` semantics: ``x / max(|x|, eps)``.

    The norm is computed as ``sqrt(max(sum(x^2), tiny))`` so its gradient is
    defined (zero) at ``x = 0`` — torch's subgradient convention; a bare
    ``jnp.linalg.norm`` yields NaN gradients there.
    """
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(sq, 1e-24))
    return x / jnp.maximum(n, eps)


class PointNetPP(nn.Module):
    """Forward-vector regression head: fc 256 -> 3, raw output.

    Parity: `models/pointnet_pp.py:45-68`.
    """

    sampling: str = "random"
    grouping: str = "knn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        feat = PointNetPPTrunk(
            sampling=self.sampling,
            grouping=self.grouping,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(xyz, train=train)
        return nn.Dense(3)(feat)


class PointNetPPXYZ(nn.Module):
    """Two-axis regression: ``head_x`` and ``head_y``, each L2-normalized.

    Parity: `models/Pointnet_pp_xyz.py:47-90`. ``normalize_heads=False``
    reproduces the reference's no-L2-norm ablation
    (`results/without_l2_norm/summary.txt`).
    """

    sampling: str = "random"
    grouping: str = "knn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    normalize_heads: bool = True

    @nn.compact
    def __call__(
        self, xyz: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        feat = PointNetPPTrunk(
            sampling=self.sampling,
            grouping=self.grouping,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(xyz, train=train)
        norm = _l2_normalize if self.normalize_heads else (lambda x: x)
        v1 = norm(nn.Dense(3, name="head_x")(feat))
        v2 = norm(nn.Dense(3, name="head_y")(feat))
        return v1, v2


class PointNetPPXYZSchmidt(nn.Module):
    """Up/forward two-axis regression: ``head_y`` (up) and ``head_z``
    (forward), L2-normalized; optional Gram-Schmidt orthogonalization of the
    up vector against the forward vector.

    Parity: `models/Pointnet_pp_xyz_Schedmit.py:47-92` (normalized heads) and
    the kept-but-commented Schmidt block (:95-110), exposed here as
    ``gram_schmidt=True`` (the reference's "Schmidt" ablation,
    `results/chair_schemit/summary.txt`).
    """

    gram_schmidt: bool = False
    sampling: str = "random"
    grouping: str = "knn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # False = the reference's no-L2-norm ablation
    # (`results/without_l2_norm/summary.txt`): raw dense head outputs
    normalize_heads: bool = True

    @nn.compact
    def __call__(
        self, xyz: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        feat = PointNetPPTrunk(
            sampling=self.sampling,
            grouping=self.grouping,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(xyz, train=train)
        norm = _l2_normalize if self.normalize_heads else (lambda x: x)
        v2 = norm(nn.Dense(3, name="head_y")(feat))  # up
        v3 = norm(nn.Dense(3, name="head_z")(feat))  # forward
        if self.gram_schmidt:
            e3 = v3
            u2 = v2 - jnp.sum(v2 * e3, axis=-1, keepdims=True) * e3
            v2 = _l2_normalize(u2)
        return v2, v3


class PointNetPP8Dir(nn.Module):
    """8-way direction head: fc 256 -> 8 raw logits.

    Parity: `models/pointnet_pp_8dir.py:58-85`.
    """

    sampling: str = "random"
    grouping: str = "knn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        feat = PointNetPPTrunk(
            sampling=self.sampling,
            grouping=self.grouping,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(xyz, train=train)
        return nn.Dense(8)(feat)


class PointNetPPFwd(nn.Module):
    """Unit forward-vector head: fc 256 -> 3, L2-normalized.

    Parity: `models/pointnet_pp_Fwd.py:77-98`.
    """

    sampling: str = "random"
    grouping: str = "knn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        feat = PointNetPPTrunk(
            sampling=self.sampling,
            grouping=self.grouping,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(xyz, train=train)
        return _l2_normalize(nn.Dense(3)(feat))


class PointNetPPVonMises(nn.Module):
    """Single-peak von Mises head.

    ``mu_parameterization``:

    * ``"tanh"`` (default, reference parity): ``mu = tanh(.) * pi``
      (`models/pointnet_pp_vonMises.py:36`). This squash cannot wrap — a
      target near ±pi sits at the saturated tail of tanh, which slows
      convergence for yaw angles around the back direction.
    * ``"atan2"`` (framework improvement): predict a 2-vector, normalize,
      ``mu = atan2(s, c)`` — rotation-equivariant, no boundary. Same trick
      the reference's own MvM head uses (`pointnet_pp_mvM.py:95-115`).

    ``kappa = softplus(.)`` in both cases.
    """

    mu_parameterization: str = "tanh"
    sampling: str = "random"
    grouping: str = "knn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, xyz: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        feat = PointNetPPTrunk(
            sampling=self.sampling,
            grouping=self.grouping,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(xyz, train=train)
        if self.mu_parameterization == "atan2":
            out = nn.Dense(3)(feat)
            cs = out[:, :2]
            sq = jnp.sum(cs * cs, axis=-1, keepdims=True)
            cs = cs / jnp.maximum(jnp.sqrt(jnp.maximum(sq, 1e-24)), 1e-4)
            c, s = cs[:, 0], cs[:, 1]
            degenerate = jnp.hypot(c, s) < 1e-3
            c = jnp.where(degenerate, 1.0, c)
            s = jnp.where(degenerate, 0.0, s)
            mu = jnp.arctan2(s, c)
            kappa = nn.softplus(out[:, 2])
        else:
            out = nn.Dense(2)(feat)
            mu = jnp.tanh(out[:, 0]) * math.pi
            kappa = nn.softplus(out[:, 1])
        return mu, kappa


class PointNetPPMvM(nn.Module):
    """Mixture-of-von-Mises head over a LayerNorm trunk.

    Three heads of width ``max_K``:

    * ``head_pi`` — temperature-``temp`` softmax mixture weights, zero-init;
    * ``head_mu`` — ``2K`` outputs -> unit (cos, sin) with eps 1e-4 and a
      degenerate-vector fallback to angle 0 -> ``atan2``; zero-init;
    * ``head_kappa`` — ``softplus + 1e-6`` clamped at ``kappa_max``.

    Parity: `models/pointnet_pp_mvM.py:30-127` (LayerNorm trunk :58-60,
    dropout after each fc :82-83, zero inits :69-73, mu guard :102-115,
    kappa squash :122-125).
    """

    max_K: int = 4
    kappa_max: float = 80.0
    p_drop: float = 0.4
    temp: float = 0.7
    sampling: str = "random"
    grouping: str = "knn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # Robustness knobs (framework improvements; defaults = reference parity).
    # The matched-MvM objective is bistable on K=2 categories: with the
    # reference's zero-init all components start at the same mu, and once the
    # mismatched component's weight shrinks its mu gradient (prop. to
    # w * sin(dmu)) stalls at the 180-degree saddle — see RESULTS.md.
    weight_floor: float = 0.0  # w = (1-f)*softmax + f/K keeps all gradients alive
    mu_init: str = "zero"  # "spread": bias inits mu_k at angle 2*pi*k/K

    @nn.compact
    def __call__(
        self, xyz: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        feat = PointNetPPTrunk(
            fc_norm="layer",
            p_drop=self.p_drop,
            drop_each_fc=True,
            sampling=self.sampling,
            grouping=self.grouping,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(xyz, train=train)

        zeros = nn.initializers.zeros
        logit_pi = nn.Dense(self.max_K, kernel_init=zeros, name="head_pi")(feat)
        weight = nn.softmax(logit_pi / self.temp, axis=-1)
        if self.weight_floor:
            f = self.weight_floor
            weight = (1.0 - f) * weight + f / self.max_K

        if self.mu_init == "spread":
            import numpy as _np

            angles = 2.0 * _np.pi * _np.arange(self.max_K) / self.max_K
            spread = _np.stack([_np.cos(angles), _np.sin(angles)], -1).reshape(-1)

            def mu_bias_init(key, shape, dtype=jnp.float32):
                return jnp.asarray(spread, dtype)

        else:
            mu_bias_init = zeros
        mu_raw = nn.Dense(self.max_K * 2, kernel_init=zeros,
                          bias_init=mu_bias_init, name="head_mu")(feat)
        mu_raw = mu_raw.reshape(-1, self.max_K, 2)
        # safe norm: gradient defined (0) at the zero-init point
        sq = jnp.sum(mu_raw * mu_raw, axis=-1, keepdims=True)
        mu_unit = mu_raw / jnp.maximum(jnp.sqrt(jnp.maximum(sq, 1e-24)), 1e-4)
        c, s = mu_unit[..., 0], mu_unit[..., 1]
        degenerate = jnp.hypot(c, s) < 1e-3
        c = jnp.where(degenerate, 1.0, c)
        s = jnp.where(degenerate, 0.0, s)
        mu = jnp.arctan2(s, c)

        kappa_raw = nn.Dense(self.max_K, name="head_kappa")(feat)
        kappa = jnp.minimum(nn.softplus(kappa_raw) + 1e-6, self.kappa_max)
        return mu, kappa, weight


class PointNetPPCls(nn.Module):
    """The demo ModelNet40 classifier: FPS + radius ball-query SA stages.

    SA(512, r=0.2, K=32, [64,64,128]) -> SA(128, r=0.4, K=64, [128,128,256])
    -> group-all [256,512,1024] -> fc with dropout 0.4 -> ``num_classes``
    log-probabilities. Accepts ``(B, N, 3)`` or ``(B, N, 6)`` (xyz + normals).
    Parity: `PointNet++Demo.py:177-245`.
    """

    num_classes: int = 40
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        xyz = x[..., :3]
        points = x[..., 3:] if x.shape[-1] > 3 else None
        sa_kwargs = dict(
            sampling="fps", grouping="ball", bn_axis_name=self.bn_axis_name
        )
        l1_xyz, l1_pts = SetAbstraction(
            512, 32, (64, 64, 128), radius=0.2, **sa_kwargs
        )(xyz, points, train=train)
        l2_xyz, l2_pts = SetAbstraction(
            128, 64, (128, 128, 256), radius=0.4, **sa_kwargs
        )(l1_xyz, l1_pts, train=train)
        _, l3_pts = SetAbstraction(None, None, (256, 512, 1024), group_all=True)(
            l2_xyz, l2_pts, train=train
        )
        h = l3_pts.reshape(x.shape[0], -1)

        def _bn():
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name,
            )

        h = nn.relu(_bn()(nn.Dense(512)(h)))
        h = nn.Dropout(0.4)(h, deterministic=not train)
        h = nn.relu(_bn()(nn.Dense(256)(h)))
        h = nn.Dropout(0.4)(h, deterministic=not train)
        return nn.log_softmax(nn.Dense(self.num_classes)(h), axis=-1)
