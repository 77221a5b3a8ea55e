"""DP scaling rehearsal on the virtual CPU mesh (VERDICT r1 item 8).

Real multi-chip hardware is unavailable in this environment; this records
the *structural* scaling evidence on the 8-device virtual CPU mesh:

* weak scaling — per-device batch fixed at 16, global batch 16*m, so an
  epoch over a fixed dataset takes 1/m as many optimizer steps;
* invariance — the final first-epoch loss at a FIXED global batch is
  identical at every mesh size (pinned by
  tests/test_resume_and_parallel.py::test_dp_global_batch_invariance_across_mesh_sizes).

CPU wall-times are not TPU predictions; steps/epoch and clouds/step are the
mesh-independent quantities the table exists to pin down.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/dp_scaling.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def _force_cpu(n=8):
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge

    xla_bridge._clear_backends()


def main():
    _force_cpu(8)
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.parallel import make_mesh
    from pointcloud_orientation_tpu.train import Trainer, preset

    ds = OrientationDataset.synthetic(samples_per_class=64, num_points=256)
    print(f"{'mesh':>4} {'global_batch':>12} {'steps/epoch':>11} "
          f"{'clouds/step':>11} {'epoch1 loss':>12} {'wall s':>7}")
    base_loss = None
    for m in (1, 2, 4, 8):
        cfg = preset("8dir_kl").replace(
            num_points=256, batch_size=16 * m, epochs=1, optimizer="sgd"
        )
        mesh = None if m == 1 else make_mesh(("data",), (m,), jax.devices()[:m])
        tr = Trainer(cfg, ds, mesh=mesh)
        t0 = time.time()
        tr.fit(epochs=1, log_every=0)
        wall = time.time() - t0
        n_train = len(tr.train_ds)
        steps = -(-n_train // cfg.batch_size)
        loss = tr.history["train"][0]
        if m == 1:
            base_loss = loss
        print(f"{m:>4} {cfg.batch_size:>12} {steps:>11} "
              f"{cfg.batch_size:>11} {loss:>12.6f} {wall:>7.1f}")
    print(f"(fixed-global-batch invariance at B=16: see "
          f"test_dp_global_batch_invariance_across_mesh_sizes; epoch-1 loss "
          f"matches the single-device value to 1e-5)")


if __name__ == "__main__":
    main()
