"""Ahead-of-time serving artifacts via ``jax.export`` (StableHLO).

The reference's only deployment format is a torch ``state_dict`` ``.pth``
written at the end of each training script (`train_8dir_KL.py:122`,
`train.py:216-217`) — serving it requires the full Python model code. This
module goes further in the TPU-native direction: it serializes the ENTIRE
inference function — architecture, weights, batch-norm statistics — into
one portable StableHLO artifact via :func:`jax.export.export`.

Properties of the artifact:

* **self-contained**: loading and calling it needs only ``jax`` —
  not this package, not flax, not the model class;
* **multi-platform**: one artifact can carry lowerings for several
  backends (default ``("cpu", "tpu")``) chosen at export time, so the
  same file serves on a TPU pod and on a CPU fallback host;
* **deterministic**: exported without a ``'sampling'`` PRNG collection,
  so centroid sampling takes the deterministic first-``npoint`` fallback
  (the same convention the parity tests use) — identical outputs for
  identical inputs, which is what a serving artifact should do;
* **portable by default**: the compute path is pure XLA (Pallas dispatch
  is forced off during tracing) so the artifact contains no
  hardware-pinned Mosaic custom calls. Pass ``use_pallas=True`` to keep
  the fused TPU kernels in a TPU-only artifact instead. The opt-in
  approximate kNN (``set_knn_impl("approx")``) composes freely: its
  ``ApproxTopK`` custom call is on jax.export's guaranteed-stable list,
  so the artifact stays multi-platform with no safety opt-out
  (test-pinned).

Example
-------
    from pointcloud_orientation_tpu.utils.stablehlo_export import (
        export_orientation_model, save_artifact, load_artifact)

    exp = export_orientation_model("pointnet_pp_8dir", params, batch_stats,
                                   batch_size=64, num_points=1024)
    save_artifact("model.stablehlo", exp)

    # ... on the serving host (only jax required):
    import jax.export
    with open("model.stablehlo", "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    logits = exported.call(clouds)          # (64, 1024, 3) -> (64, 8)
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def _pallas_mode(mode: Optional[str]):
    from ..ops import geometry

    if mode is None:
        yield
        return
    prev = geometry._PALLAS_MODE
    geometry.set_pallas_mode(mode)
    try:
        yield
    finally:
        geometry.set_pallas_mode(prev)


def export_orientation_model(
    model_name: str,
    params: Dict,
    batch_stats: Optional[Dict] = None,
    *,
    batch_size: Optional[int],
    num_points: int = 1024,
    platforms: Sequence[str] = ("cpu", "tpu"),
    use_pallas: bool = False,
    model_kwargs: Optional[Dict[str, Any]] = None,
) -> "jax.export.Exported":
    """Export an inference forward as a multi-platform StableHLO module.

    Weights and batch statistics are baked into the module as constants;
    the exported callable takes exactly one argument, the point clouds
    ``(batch_size, num_points, 3) float32``, and returns the model's
    native eval output (e.g. 8-dir logits).

    ``batch_size=None`` exports a shape-polymorphic artifact (symbolic
    batch dimension): one file serves ANY batch size. Best for CPU
    fallback hosts — on TPU each distinct batch still compiles its own
    program at load time, so fixed buckets (the
    :class:`~pointcloud_orientation_tpu.infer.OrientationPredictor`
    strategy) remain the serving-latency answer there.
    """
    from jax import export as jax_export

    from ..models import MODEL_REGISTRY

    model = MODEL_REGISTRY[model_name](**(model_kwargs or {}))
    variables: Dict[str, Any] = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    def forward(pts):
        return model.apply(variables, pts, train=False)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, num_points, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, num_points, 3), jnp.float32)
    kwargs: Dict[str, Any] = {"platforms": list(platforms)}
    if use_pallas:
        # Mosaic kernels arrive as tpu_custom_call; exporting them is an
        # explicit opt-out of the custom-call safety check and pins the
        # artifact to compatible TPU runtimes.
        kwargs["disabled_checks"] = [
            jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
    with _pallas_mode("always" if use_pallas else "never"):
        return jax_export.export(jax.jit(forward), **kwargs)(spec)


def save_artifact(path: str, exported: "jax.export.Exported") -> None:
    """Serialize an :class:`jax.export.Exported` to ``path``."""
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_artifact(path: str) -> "jax.export.Exported":
    """Load a serialized artifact; run it with ``.call(clouds)``."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


def main(argv: Optional[Sequence[str]] = None) -> None:
    """CLI: Orbax or torch checkpoint -> StableHLO serving artifact."""
    import argparse

    p = argparse.ArgumentParser(
        description="Export a trained checkpoint as a self-contained "
        "StableHLO serving artifact (jax.export)."
    )
    p.add_argument("checkpoint", help="Orbax checkpoint dir or torch .pth")
    p.add_argument("output", help="output artifact path (.stablehlo)")
    p.add_argument("--model", default="pointnet_pp_8dir")
    p.add_argument(
        "--batch-size", type=int, default=64,
        help="fixed batch dimension; 0 = shape-polymorphic (any batch)",
    )
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument(
        "--platforms", default="cpu,tpu",
        help="comma-separated lowering targets (default: cpu,tpu)",
    )
    p.add_argument(
        "--pallas", action="store_true",
        help="keep fused Pallas TPU kernels (TPU-pinned artifact)",
    )
    args = p.parse_args(argv)

    if args.checkpoint.endswith((".pth", ".pt")):
        from .torch_import import load_torch_checkpoint

        params, stats = load_torch_checkpoint(args.checkpoint, args.model)
    else:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckpt = ckptr.restore(args.checkpoint)
        params, stats = ckpt["params"], ckpt.get("batch_stats")

    exported = export_orientation_model(
        args.model,
        params,
        stats,
        batch_size=args.batch_size or None,
        num_points=args.num_points,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s.strip()),
        use_pallas=args.pallas,
    )
    save_artifact(args.output, exported)
    size = len(exported.serialize())
    batch_str = str(args.batch_size) if args.batch_size else "b"
    print(
        f"wrote {args.output}: model={args.model} "
        f"shape=({batch_str},{args.num_points},3) "
        f"platforms={exported.platforms} bytes={size}"
    )


if __name__ == "__main__":
    main()
