"""Batched serving API: pre-compiled fixed-shape inference with padding.

The reference has no inference path beyond ad-hoc loops in its training
scripts (`train.py:228-246`). This module provides the production surface:
load weights (ours or a reference ``.pth``), compile once per (batch,
points) bucket, and serve arbitrary-size requests by padding to the bucket —
no recompiles, no host-side per-sample work.

Example
-------
    from pointcloud_orientation_tpu.infer import OrientationPredictor

    predictor = OrientationPredictor.from_torch_checkpoint(
        "8dir_KLdiv_0926.pth", model="pointnet_pp_8dir")
    out = predictor(clouds)               # (B, N, 3) numpy -> logits (B, 8)
    fwd = predictor.forward_vectors(clouds)  # decoded unit forward vectors
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import MODEL_REGISTRY, MULTI_OUTPUT_MODELS
from .ops import DIRS_8


def _round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


class OrientationPredictor:
    """Fixed-shape, jit-compiled predictor over any framework model.

    Requests are padded up to the next batch bucket (powers of two by
    default) so each bucket compiles exactly once; point count is padded by
    repeating points (harmless for sampling/grouping semantics).

    Large-N serving: at N=10,000 the opt-in approximate grouping halves
    batch device latency (2.03× at B=64, RESULTS.md). It is a process-wide
    trace-time knob, so set it BEFORE the first predict:
    ``pointcloud_orientation_tpu.ops.set_knn_impl("approx")`` or
    ``PCOT_KNN=approx`` in the environment.
    """

    def __init__(
        self,
        model_name: str,
        params: Dict,
        batch_stats: Optional[Dict] = None,
        num_points: int = 1024,
        max_batch: int = 256,
        seed: int = 0,
        quantize: Optional[str] = None,
        scales: Optional[Dict] = None,
        mesh=None,
        mesh_axis: str = "data",
        tta_views: int = 1,
        ensemble_size: int = 1,
        **model_kwargs: Any,
    ):
        """``mesh``/``mesh_axis``: optional multi-chip serving — weights are
        replicated over the mesh and each request's bucket batch is sharded
        over ``mesh_axis`` (XLA data-parallel inference; buckets round up to
        a multiple of the axis size so shards stay static-shaped).

        ``tta_views``: test-time augmentation by yaw-rotation voting, for
        every yaw-equivariant head family:

        * 8-dir (V in 2/4/8 — 45°-multiple views): per-view distributions
          are slot-unshifted then averaged; outputs stay logits.
          Measured 6.97° → 1.91° at V=8 (RESULTS.md "Yaw-voting TTA").
        * forward/axes vector heads (any V): predicted vectors derotate
          by R(θ)ᵀ and average.
        * von Mises (any V): per-view μ derotates by +θ; the exact
          density average (a V-component mixture) is moment-matched back
          to a single (μ, κ) so the head contract is unchanged.
        * MvM (any V): component μ's derotate; the output is the exact
          averaged mixture with V·K components (weights ÷ V) — same
          tuple structure, wider component axis.

        View noise cancels while the signal aligns, for V× inference
        FLOPs.

        ``ensemble_size``: deep-ensemble serving over S independently
        trained members (e.g. a vmapped seed sweep,
        ``train.multiseed.run_multi_seed(return_params=True)`` — see
        :meth:`from_seed_sweep`). ``params``/``batch_stats`` arrive with a
        leading ``S`` axis; one jitted program vmaps the network over the
        member axis and combines with the SAME per-family math as TTA
        (seed members are "views at angle 0"): 8-dir averages member
        probabilities, vector/axes heads average derotated vectors, vM
        moment-matches the S·V-component average density, MvM returns the
        exact averaged mixture with S·V·K components (weights ÷ S·V).
        Composes with ``tta_views`` — the joint average runs over all
        S·V network evaluations in one program. The reference has no
        ensemble path at all; seed variance is the dominant error term on
        every measured protocol (RESULTS.md north-star envelopes), which
        is exactly what ensembling averages away."""
        if model_name in MULTI_OUTPUT_MODELS:
            raise ValueError(
                f"{model_name!r} returns (out, aux_loss) — a training-only "
                "contract (task 'forward_mse_aux'); the serving predictor "
                "requires a single-output head. Serve 'point_transformer' "
                "(the dense variant) instead.")
        self.model = MODEL_REGISTRY[model_name](**model_kwargs)
        self.model_name = model_name
        self.num_points = num_points
        self.max_batch = max_batch
        _tta_vector = {"pointnet_pp", "pointnet_pp_fwd", "simple_pointnet",
                       "point_transformer"}
        _tta_tuple = {"pointnet_pp_xyz", "pointnet_pp_xyz_schmidt"}
        _tta_dist = {"pointnet_pp_von_mises", "pointnet_pp_mvm"}
        if tta_views < 1:
            raise ValueError(f"tta_views must be >= 1, got {tta_views}")
        if ensemble_size < 1:
            raise ValueError(
                f"ensemble_size must be >= 1, got {ensemble_size}")
        if tta_views > 1:
            if model_name == "pointnet_pp_8dir":
                if tta_views not in (2, 4, 8):
                    raise ValueError(
                        "8-dir TTA needs 45°-multiple views: tta_views in "
                        f"(2, 4, 8), got {tta_views}")
            elif model_name not in _tta_vector | _tta_tuple | _tta_dist:
                raise ValueError(
                    "yaw-voting TTA needs a yaw-equivariant head (8-dir "
                    "slot shift, forward/axes vector derotation, or "
                    "vM/MvM angle derotation); model "
                    f"{model_name!r} is unsupported")
        if ensemble_size > 1:
            known = _tta_vector | _tta_tuple | _tta_dist | {"pointnet_pp_8dir"}
            if model_name not in known:
                raise ValueError(
                    "ensemble combining needs a head family with a defined "
                    "average (8-dir probs, vectors, vM/MvM densities); "
                    f"model {model_name!r} is unsupported")
            if quantize is not None or scales is not None:
                raise ValueError(
                    "ensemble_size > 1 with int8 quantization is "
                    "unsupported (per-member scale trees don't stack)")
        if (tta_views > 1 or ensemble_size > 1) and mesh is not None:
            raise ValueError(
                "tta_views/ensemble_size > 1 with a mesh is unsupported "
                "(the view/member-stacked batch would break the bucket "
                "sharding)")
        self.tta_views = tta_views
        self.ensemble_size = ensemble_size
        self._tta_mode = (
            "slots" if model_name == "pointnet_pp_8dir"
            else "tuple" if model_name in _tta_tuple
            else "vm" if model_name == "pointnet_pp_von_mises"
            else "mvm" if model_name == "pointnet_pp_mvm"
            else "vector")
        self._scales = None
        if scales is not None:  # params arrive already int8-quantized
            self._scales = {k: jnp.asarray(v) for k, v in scales.items()}
        elif quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unknown quantize mode {quantize!r}")
            from .utils.quantize import quantize_params_int8

            params, qscales = quantize_params_int8(params)
            self._scales = {k: jnp.asarray(v) for k, v in qscales.items()}
        self.variables = {"params": params}
        if batch_stats:
            self.variables["batch_stats"] = batch_stats
        self._rng = jax.random.PRNGKey(seed)
        self.mesh = mesh
        self._in_sharding = None
        self._axis_size = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            self.variables = jax.device_put(
                jax.tree_util.tree_map(jnp.asarray, self.variables), replicated
            )
            if self._scales is not None:
                self._scales = jax.device_put(self._scales, replicated)
            self._in_sharding = NamedSharding(mesh, P(mesh_axis))
            self._axis_size = mesh.shape[mesh_axis]

        V = self.tta_views
        S = self.ensemble_size

        @functools.partial(jax.jit, static_argnames=())
        def _apply(variables, scales, pts, rng):
            if scales:  # weight-only int8: dequant fuses into the matmuls
                from .utils.quantize import dequantize_params

                variables = dict(
                    variables,
                    params=dequantize_params(variables["params"], scales),
                )

            def net(vars_, x):
                return self.model.apply(
                    vars_, x, train=False, rngs={"sampling": rng})

            if V == 1 and S == 1:
                return net(variables, pts)
            # yaw-voting TTA / deep-ensemble combine: one model call per
            # member on the (V*B) view-stacked batch, per-view derotation,
            # average over all S·V evaluations. 8-dir: 45°-multiple views
            # unshift by label slots; vector/axes heads: ANY-angle views
            # derotate the predicted vectors (R^T v) — exact yaw
            # equivariance either way. Ensemble members are "views at
            # angle 0": every family's combine is an equal-weight average,
            # so the two axes fold into one.
            from .ops.rotations import yaw_matrix

            if self._tta_mode == "slots":
                step = 8 // V
                angles = jnp.asarray(
                    [i * step * jnp.pi / 4 for i in range(V)])
            else:
                angles = jnp.asarray(
                    [i * 2.0 * jnp.pi / V for i in range(V)])
            rots = yaw_matrix(angles)  # (V, 3, 3)
            B = pts.shape[0]
            if V > 1:
                views = jnp.einsum(
                    "vij,bnj->vbni", rots, pts,
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(V * B, *pts.shape[1:])
            else:
                views = pts
            if S > 1:
                # member axis = leading axis of every param/stat leaf
                out = jax.vmap(lambda vs: net(vs, views))(variables)
            else:
                out = jax.tree_util.tree_map(
                    lambda a: a[None], net(variables, views))
            # every leaf is now (S, V*B, ...)
            if self._tta_mode == "slots":
                step = 8 // V
                probs = jax.nn.softmax(out, axis=-1).reshape(S, V, B, 8)
                unshifted = jnp.stack(
                    [jnp.roll(probs[:, i], i * step, axis=-1)
                     for i in range(V)], axis=1)
                return jnp.log(unshifted.mean((0, 1)) + 1e-12)

            # distribution heads: rotating a cloud by yaw(theta) shifts the
            # label angle by -theta (measured: ops/rotations.py mu
            # convention), so each view's mu derotates by +angle.
            if self._tta_mode == "vm":
                from .ops.von_mises import vm_mixture_moment_match

                mu, kappa = out  # (S, V*B) each
                mu = mu.reshape(S, V, B) + angles[None, :, None]
                # the exact density average is an (S·V)-component mixture;
                # the head's (mu, kappa) contract is kept by the joint
                # first-circular-moment fit (mu* = arg m1, k* = A^-1(|m1|))
                return vm_mixture_moment_match(
                    mu.reshape(S * V, B), kappa.reshape(S * V, B), axis=0)
            if self._tta_mode == "mvm":
                from .ops.von_mises import wrap_angle

                mu, kappa, w = out  # (S, V*B, K) each
                K = mu.shape[-1]
                # the average of S·V mixtures IS a mixture: return the
                # exact (S·V·K)-component result — weights scaled by
                # 1/(S·V), every downstream consumer (grid density,
                # argmax-weight decode) works unchanged on the wider
                # component axis
                mu = wrap_angle(
                    mu.reshape(S, V, B, K) + angles[None, :, None, None])
                mu = jnp.moveaxis(
                    mu.reshape(S * V, B, K), 0, 1).reshape(B, S * V * K)
                kappa = jnp.moveaxis(
                    kappa.reshape(S, V, B, K).reshape(S * V, B, K),
                    0, 1).reshape(B, S * V * K)
                w = jnp.moveaxis(
                    w.reshape(S, V, B, K).reshape(S * V, B, K),
                    0, 1).reshape(B, S * V * K) / (S * V)
                return mu, kappa, w

            def derotate_mean(vecs):
                vv = vecs.reshape(S, V, B, 3)
                back = jnp.einsum(
                    "vji,svbj->svbi", rots, vv,
                    precision=jax.lax.Precision.HIGHEST,
                )  # R(-θ) v per view, every member
                return back.mean((0, 1))

            if self._tta_mode == "tuple":
                return tuple(derotate_mean(v) for v in out)
            return derotate_mean(out)

        self._apply = _apply

    # ---------- constructors ----------

    @classmethod
    def from_torch_checkpoint(
        cls, path: str, model: str = "pointnet_pp_8dir", **kw
    ) -> "OrientationPredictor":
        from .utils import load_torch_checkpoint

        params, stats = load_torch_checkpoint(path, model)
        return cls(model, params, stats, **kw)

    @classmethod
    def from_orbax_checkpoint(
        cls, path: str, model: str, **kw
    ) -> "OrientationPredictor":
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckpt = ckptr.restore(path)
        return cls(model, ckpt["params"], ckpt.get("batch_stats"), **kw)

    @classmethod
    def from_quantized_checkpoint(
        cls, path: str, model: str, **kw
    ) -> "OrientationPredictor":
        """Serve straight from an int8 ``.npz`` artifact
        (:func:`~pointcloud_orientation_tpu.utils.save_quantized_checkpoint`)
        — ~4× smaller on disk/wire than the f32 checkpoint."""
        from .utils.quantize import load_quantized_checkpoint

        quantized, scales, batch_stats = load_quantized_checkpoint(path)
        return cls(model, quantized, batch_stats, scales=scales, **kw)

    @classmethod
    def from_seed_sweep(
        cls, model: str, members, **kw
    ) -> "OrientationPredictor":
        """Deep ensemble from per-member weight trees — e.g. the vmapped
        seed sweep's output (``run_multi_seed(..., return_params=True)``):

            res = run_multi_seed(cfg, ds, seeds=range(42, 50),
                                 return_params=True)
            pred = OrientationPredictor.from_seed_sweep(
                cfg.model, [res[s] for s in sorted(res)])

        ``members``: sequence of ``{"params": tree, "batch_stats": tree}``
        dicts (``batch_stats`` optional but must be all-present or
        all-absent). Leaves are stacked on a new leading member axis and
        served through one jitted program (see ``ensemble_size``)."""
        # (single-member sweeps fall through to the plain predictor below)
        members = list(members)
        if not members:
            raise ValueError("from_seed_sweep needs at least one member")
        if len(members) == 1:  # S=1 serves unstacked (plain predictor)
            m = members[0]
            return cls(model, m["params"], m.get("batch_stats"), **kw)
        params = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[m["params"] for m in members])
        stats = [m.get("batch_stats") for m in members]
        if any(s is not None for s in stats):
            if any(s is None for s in stats):
                raise ValueError(
                    "batch_stats must be present for every member or none")
            batch_stats = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *stats)
        else:
            batch_stats = None
        return cls(model, params, batch_stats,
                   ensemble_size=len(members), **kw)

    @classmethod
    def from_protocol_checkpoint(
        cls, path: str, model: str, members=None, **kw
    ) -> "OrientationPredictor":
        """Deep ensemble straight from a vmapped MULTI-SEED protocol
        checkpoint (``--seeds ... --checkpoint-every``,
        `train/protocol_ckpt.py`): the saved carry's best-val weights
        already carry the stacked member axis, so the whole sweep serves
        with zero re-stacking. ``path`` is a ``step_<E>`` directory;
        ``members`` optionally selects a subset by member index.

        Not for the per-LABEL protocol's checkpoints — those stack 40
        per-class models whose outputs answer different questions;
        averaging them is not an ensemble. Both protocols write the same
        ``step_<E>`` layout, so this validates the sidecar
        ``history.json``: its keys must parse as seed ints (the per-label
        protocol's are label strings) unless ``allow_label_keys=True``.

        Members whose validation never improved (diverged/NaN seeds —
        their saved ``best_val`` is non-finite and their ``best_params``
        slot still holds init-epoch weights) are EXCLUDED by default with
        a warning; pass ``members=`` explicitly to override."""
        import warnings

        import orbax.checkpoint as ocp

        allow_label_keys = kw.pop("allow_label_keys", False)
        hist_path = os.path.join(path, "history.json")
        if not allow_label_keys and os.path.exists(hist_path):
            import json

            with open(hist_path) as f:
                keys = json.load(f).get("keys", [])
            try:
                [int(k) for k in keys]
            except (TypeError, ValueError):
                raise ValueError(
                    f"checkpoint at {path} has non-seed keys {keys!r} — "
                    "this looks like a per-LABEL protocol checkpoint "
                    "(40 per-class models; averaging them is not an "
                    "ensemble). Pass allow_label_keys=True to override.")

        with ocp.PyTreeCheckpointer() as ckptr:
            carry = ckptr.restore(os.path.join(path, "carry"))
        params = carry["best_params"]
        stats = carry.get("best_batch_stats") or None
        best_val = np.asarray(carry["best_val"], np.float64)
        finite = np.isfinite(best_val)
        if members is None and not finite.all():
            dropped = np.nonzero(~finite)[0].tolist()
            warnings.warn(
                f"protocol checkpoint members {dropped} have non-finite "
                "best_val (validation never improved; slots hold "
                "init-epoch weights) — excluding them from the ensemble. "
                "Pass members= explicitly to override.", stacklevel=2)
            members = np.nonzero(finite)[0].tolist()
        if members is not None:
            if len(list(members)) == 0:
                raise ValueError(
                    f"no usable ensemble members in {path}: every saved "
                    "best_val is non-finite (all seeds diverged).")
            idx = np.asarray(list(members))
            if not finite[idx].all():
                bad = idx[~finite[idx]].tolist()
                warnings.warn(
                    f"selected members {bad} have non-finite best_val — "
                    "their slots hold untrained init-epoch weights.",
                    stacklevel=2)
            take = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: np.asarray(x)[idx], t)
            params, stats = take(params), (take(stats) if stats else None)
        size = int(jax.tree_util.tree_leaves(params)[0].shape[0])
        if size == 1:  # plain predictor: drop the unit member axis
            squeeze = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: np.asarray(x)[0], t)
            return cls(model, squeeze(params),
                       squeeze(stats) if stats else None, **kw)
        return cls(model, params, stats, ensemble_size=size, **kw)

    # ---------- serving ----------

    def _bucket(self, b: int) -> int:
        bucket = self._axis_size  # each mesh shard gets an equal static slice
        while bucket < b:
            bucket *= 2
        # the clamp must stay a multiple of the axis size too, or device_put
        # with a NamedSharding over the batch axis rejects the bucket (e.g.
        # axis 16, max_batch=24 -> clamp to 32, not 24)
        cap = _round_up(max(self.max_batch, self._axis_size), self._axis_size)
        return min(bucket, cap)

    def __call__(self, clouds: np.ndarray):
        """Run the model on ``(B, N, 3)`` clouds (any B <= max_batch, any N);
        returns the model's native outputs for the original B."""
        clouds = np.asarray(clouds, np.float32)
        b, n = clouds.shape[0], clouds.shape[1]
        if b > self.max_batch:
            chunks = [
                self(clouds[i : i + self.max_batch])
                for i in range(0, b, self.max_batch)
            ]
            return jax.tree_util.tree_map(
                lambda *xs: np.concatenate(xs, axis=0), *chunks
            )
        # pad points by cycling, batch by repeating the first cloud
        if n < self.num_points:
            reps = -(-self.num_points // n)
            clouds = np.tile(clouds, (1, reps, 1))[:, : self.num_points]
        elif n > self.num_points:
            clouds = clouds[:, : self.num_points]
        bucket = self._bucket(b)
        if b < bucket:
            pad = np.repeat(clouds[:1], bucket - b, axis=0)
            clouds = np.concatenate([clouds, pad], axis=0)
        self._rng, sub = jax.random.split(self._rng)
        pts = jnp.asarray(clouds)
        if self._in_sharding is not None:
            pts = jax.device_put(pts, self._in_sharding)
        out = self._apply(self.variables, self._scales, pts, sub)
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:b], out)

    def forward_vectors(self, clouds: np.ndarray) -> np.ndarray:
        """Decode the model's output to unit forward vectors ``(B, 3)``."""
        out = self(clouds)
        name = self.model_name
        if name in ("pointnet_pp_8dir",):
            probs = np.asarray(jax.nn.softmax(jnp.asarray(out), axis=-1))
            fwd = probs @ np.asarray(DIRS_8)
        elif name in ("pointnet_pp_von_mises",):
            mu = np.asarray(out[0])
            fwd = np.stack([np.sin(mu), np.zeros_like(mu), -np.cos(mu)], -1)
        elif name in ("pointnet_pp_mvm",):
            mu_all, _, w = out
            mu = np.take_along_axis(
                np.asarray(mu_all), np.argmax(np.asarray(w), -1)[:, None], 1
            )[:, 0]
            fwd = np.stack([np.sin(mu), np.zeros_like(mu), -np.cos(mu)], -1)
        elif name in ("pointnet_pp_xyz", "pointnet_pp_xyz_schmidt"):
            fwd = np.asarray(out[-1])  # forward head
        else:  # raw / normalized 3-vector heads
            fwd = np.asarray(out)
        return fwd / (np.linalg.norm(fwd, axis=-1, keepdims=True) + 1e-12)
