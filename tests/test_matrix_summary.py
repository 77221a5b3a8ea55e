"""Pins `benchmarks/summarize_matrix.py`: seed-envelope collection, the
axes per-label aggregation, the disjoint-envelope verdict rule, and
cross-load agreement extraction — on synthetic cells in a tmpdir."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

import summarize_matrix as sm  # noqa: E402


def _cell(loss, ang, **extra):
    return {"loss": loss, "mean_angular_error_deg": ang,
            "per_class": {}, "count": 1, "head": "x", "ckpt": "c",
            "tree": "t", "stack": "s", **extra}


def _write(d, name, obj):
    with open(os.path.join(d, name), "w") as f:
        json.dump(obj, f)


def test_envelopes_verdicts_and_crossload(tmp_path):
    d = str(tmp_path)
    # 8dir: ours wrapped single-entry files, one per seed; envelopes disjoint
    _write(d, "ours_8dir_eval.json", {"8dir": _cell(1.0, 7.0)})
    _write(d, "ours_8dir_s43_eval.json", {"8dir_s43": _cell(1.1, 7.4)})
    _write(d, "ref_8dir_eval.json", _cell(1.2, 8.0))
    _write(d, "ref_8dir_s43_eval.json", _cell(1.3, 9.0))
    # vm: overlapping envelopes -> noise-bounded
    _write(d, "ours_vm_eval.json", {"vm": _cell(2.0, 50.0)})
    _write(d, "ours_vm_s43_eval.json", {"vm_s43": _cell(2.3, 52.0)})
    _write(d, "ref_vm_eval.json", _cell(2.2, 51.0))
    # variant cells must be ignored, not crash or pollute
    _write(d, "ours_vm_atan2_eval.json", {"vm_atan2": _cell(0.1, 1.0)})
    # axes: per-label keyed cells (ours seed legs carry the suffix in keys)
    _write(d, "ours_axes_eval.json",
           {"chair": _cell(0.01, 10.0), "door": _cell(0.2, 70.0)})
    _write(d, "ours_axes_s43_eval.json",
           {"chair_s43": _cell(0.02, 12.0), "door_s43": _cell(0.22, 72.0)})
    _write(d, "ref_axes_eval.json",
           {"chair": _cell(0.03, 14.0), "door": _cell(0.25, 76.0)})
    # cross-load cells for vm (ours ckpt under torch / ref ckpt under ours)
    _write(d, "ours_vm_under_torch.json", _cell(2.05, 50.4))
    _write(d, "ref_vm_under_ours.json", _cell(2.21, 51.1))

    m = sm.summarize(d)

    e8 = m["8dir"]["stacks"]
    assert e8["ours"]["n_seeds"] == 2 and e8["ref"]["n_seeds"] == 2
    assert e8["ours"]["seeds"] == {"42": 7.0, "43": 7.4} or \
           e8["ours"]["seeds"] == {42: 7.0, 43: 7.4}
    assert e8["ours"]["max"] < e8["ref"]["min"]
    assert m["8dir"]["verdict"] == "conclusive, ours better"
    assert abs(m["8dir"]["delta_of_means"] - (7.2 - 8.5)) < 1e-9
    assert m["8dir"]["welch"]["t"] < 0          # n=2 vs n=2 -> test runs
    assert "welch" not in m["vm"]               # ref has n=1: no t-test
    assert "welch" not in m["axes"]

    # ref has only 1 vm seed: the rule must refuse to print a direction
    assert m["vm"]["verdict"] == \
        "insufficient reference seeds (n=1) — no direction"
    assert m["vm"]["stacks"]["ours"]["n_seeds"] == 2  # atan2 ignored
    cl = m["vm"]["crossload_seed42"]
    assert abs(cl["ours"]["abs_disagreement"] - 0.05) < 1e-9
    assert abs(cl["ref"]["abs_disagreement"] - 0.01) < 1e-9

    ax = m["axes"]["stacks"]
    assert abs(ax["ours"]["seeds"][42] - 40.0) < 1e-9  # (10+70)/2
    assert abs(ax["ours"]["seeds"][43] - 42.0) < 1e-9  # suffix stripped
    assert abs(ax["ref"]["mean"] - 45.0) < 1e-9
    # axes ref also has n=1 -> no direction, even with disjoint envelopes
    assert m["axes"]["verdict"] == \
        "insufficient reference seeds (n=1) — no direction"

    # mvm has no cells -> present, no stacks verdict, no crash
    assert "verdict" not in m["mvm"]

    # markdown renders every family without error
    md = sm.to_markdown(m)
    assert "8dir" in md and "conclusive, ours better" in md


def test_basin_decomposition(tmp_path):
    """Families with a registered basin threshold (vm, 2.4 nats) get a
    supplementary per-stack in-basin/collapsed split; the full-envelope
    verdict is unchanged by it, and thresholdless families get none."""
    d = str(tmp_path)
    _write(d, "ours_vm_eval.json", {"vm": _cell(2.0, 50.0)})
    _write(d, "ours_vm_s43_eval.json", {"vm_s43": _cell(2.1, 51.0)})
    _write(d, "ours_vm_s44_eval.json", {"vm_s44": _cell(3.0, 85.0)})
    _write(d, "ref_vm_eval.json", _cell(2.2, 52.0))
    _write(d, "ref_vm_s43_eval.json", _cell(2.6, 63.0))
    _write(d, "ours_8dir_eval.json", {"8dir": _cell(1.0, 7.0)})
    _write(d, "ref_8dir_eval.json", _cell(1.2, 8.0))
    _write(d, "ref_8dir_s43_eval.json", _cell(1.3, 9.0))

    m = sm.summarize(d)
    b = m["vm"]["basins"]
    assert b["threshold"] == 2.4
    ours = b["stacks"]["ours"]
    assert ours["in_basin"]["n_seeds"] == 2
    assert abs(ours["in_basin"]["mean"] - 2.05) < 1e-9
    assert ours["collapsed"]["n_seeds"] == 1
    assert abs(ours["collapsed"]["mean"] - 3.0) < 1e-9
    ref = b["stacks"]["ref"]
    assert ref["in_basin"]["n_seeds"] == 1 and ref["collapsed"]["n_seeds"] == 1
    assert abs(b["in_basin_delta_of_means"] - (2.05 - 2.2)) < 1e-9
    # the verdict stays the full-envelope rule (overlapping -> parity)
    assert m["vm"]["verdict"].startswith("noise-bounded parity")
    assert "basins" not in m["8dir"]

    # all-in-basin stack: collapsed side is None, no crash
    os.remove(os.path.join(d, "ref_vm_s43_eval.json"))
    _write(d, "ref_vm_s43_eval.json", _cell(2.1, 50.0))
    m2 = sm.summarize(d)
    assert m2["vm"]["basins"]["stacks"]["ref"]["collapsed"] is None


def test_improved_head_envelope(tmp_path):
    """The ours-only vm_atan2 variant cells form their own envelope row:
    excluded from the parity vm row, vmapped seed cells take precedence
    over the legacy sequential seed-42 cell."""
    d = str(tmp_path)
    _write(d, "ours_vm_eval.json", {"vm": _cell(2.0, 50.0)})
    _write(d, "ref_vm_eval.json", _cell(2.2, 51.0))
    _write(d, "ours_vm_atan2_eval.json", {"vm_atan2": _cell(9.9, 99.0)})
    _write(d, "ours_vm_s42_atan2_eval.json", {"vm_s42": _cell(2.10, 19.0)})
    _write(d, "ours_vm_s43_atan2_eval.json", {"vm_s43": _cell(2.14, 21.0)})

    m = sm.summarize(d)
    assert m["vm"]["stacks"]["ours"]["n_seeds"] == 1  # parity row untouched
    imp = m["vm_atan2"]
    env = imp["stacks"]["ours"]
    assert env["n_seeds"] == 2
    assert abs(env["seeds"][42] - 2.10) < 1e-9        # vmapped beats legacy
    assert abs(imp["secondary"]["stacks"]["ours"]["mean"] - 20.0) < 1e-9
    assert "verdict" not in imp
    assert "ours-only improved head" in sm.to_markdown(m)
