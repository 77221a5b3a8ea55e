"""End-to-end test of the driver hooks in __graft_entry__.py.

Round-1 postmortem: the driver's multi-chip dryrun (MULTICHIP_r01.json)
failed because dryrun_multichip touched the preset TPU plugin platform
instead of forcing the virtual CPU mesh. This test calls the real function
the driver calls so the CPU-forcing path can never silently rot.
"""

import sys
from pathlib import Path

# __graft_entry__ lives at the repo root, not inside the package
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_8():
    # under the conftest 8-device CPU mesh the _ensure_cpu_mesh probe should
    # detect the live mesh and not clear backends; the full DP + SP + ring
    # phases must then run green.
    graft.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (16, 8)
    import numpy as np

    assert np.isfinite(np.asarray(out)).all()
