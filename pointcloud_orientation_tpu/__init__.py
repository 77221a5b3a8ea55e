"""pointcloud_orientation_tpu — a TPU-native JAX framework for 3D point-cloud
orientation estimation.

A ground-up re-design (not a port) of the capabilities of
``0xPabloxx/3d-pointcloud-orientation-estimation`` ("ForwardNet"): PointNet /
PointNet++ / Point-Transformer backbones with five families of orientation
heads (direct vector regression, multi-axis + orthogonality, 8-direction
distributions, single-peak von Mises, mixture-of-von-Mises), trained end to
end on TPU via jit/pjit with on-device data augmentation and ground-truth
synthesis.

Sub-packages
------------
ops       Geometric / numeric primitives (kNN, ball query, FPS, set
          abstraction grouping, von Mises KL, permutation matching, rotations)
          with XLA formulations and Pallas TPU kernels for the hot paths.
models    flax.linen model zoo (PointNet, PointNet++ variants, PointTransformer).
losses    All training objectives of the reference, vectorized and on-device.
data      ModelNet40 ingest (HDF5 -> packed arrays), ASCII-PLY import/export,
          on-device jitted augmentation + GT synthesis, batching.
parallel  Device-mesh construction and sharding helpers (DP + sequence
          parallelism); XLA collectives, no host-side communication.
train     Unified trainer, dataclass configs reproducing every reference
          entry point, metrics/artifact contract, Orbax checkpointing.
viz       Polar von-Mises-mixture density plots, axes-PLY export, loss curves.
utils     PyTorch state_dict import, profiling, debug/nan-check helpers.
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache():
    """TPU compiles in this environment go through a remote helper and cost
    minutes per program; the persistent cache turns every repeat into ~1s.
    Opt out with ``PCOT_JAX_CACHE=0``; default dir
    ``~/.cache/pointcloud_orientation_tpu/jax`` (override via the same var).
    """
    import os

    spec = os.environ.get("PCOT_JAX_CACHE", "")
    if spec == "0":
        return
    # CPU executables are AOT-compiled against exact machine features and
    # can SIGILL if a cache entry crosses machines; only the (remote,
    # minutes-per-compile) TPU path benefits, so gate on it.
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return
    import jax

    path = spec or os.path.expanduser("~/.cache/pointcloud_orientation_tpu/jax")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the remote-compile backend under-reports compile time; cache all
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - best effort
        pass


_enable_persistent_compilation_cache()
