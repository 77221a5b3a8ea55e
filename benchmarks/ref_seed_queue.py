#!/usr/bin/env python3
"""Serial queue of REFERENCE-stack seed legs for the north-star matrix.

Round-4 session-3: ``summarize_matrix`` showed the comparison had become
one-sided — ours n=11 seed envelopes vs ref n=1 for 8dir/axes (the single
reference seed sat *below* our seed mean, flipping the 8dir verdict to
"ref seed-mean better" purely for lack of reference-side statistics).
This runner gives the reference stack a matching envelope: for each
``family:seed`` job it patches the reference's own training script
(`benchmarks/cross_stack.py::prep_ref` — SEED constant + paths only),
trains it on the SHARED materialized tree (torch CPU, ~40 min/leg on this
1-core box), evaluates the checkpoint with the SHARED metric
(``eval_torch``), and writes the matrix cell
``results/cross_stack/ref_{fam}_s{seed}_eval.json``.

Resumable: jobs whose cell already exists are skipped, so the queue can be
relaunched after an interruption. Run from /root/repo:

    python benchmarks/ref_seed_queue.py 8dir:43 8dir:44 axes:43 ...

Reference scripts exercised: train_8dir_KL.py, train.py (axes),
train_single_peak_vonMises_KL.py, train_multi_peaks_vonMises_KL.py.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

from cross_stack import (  # noqa: E402
    AXES_LABELS, CLASSES_8DIR, DATA_ROOT, MVM_CLASSES_X, eval_torch,
    prep_ref)

SCRATCH = "/tmp/refrun"
OUT = os.path.join(REPO, "results", "cross_stack")

FAM = {
    "8dir": dict(script="ref_train_8dir_KL_s{seed}.py",
                 ckpt="8dir_kl_s{seed}/8dir_KLdiv_0926.pth",
                 tree="eval_tree", classes=CLASSES_8DIR),
    "vm": dict(script="ref_train_vm_s{seed}.py",
               ckpt="vm_kl_s{seed}/vonMises_best.pth",
               tree="dist_eval_tree", classes=CLASSES_8DIR),
    "mvm": dict(script="ref_train_mvm_s{seed}.py",
                ckpt="mvm_s{seed}/mvM_best.pth",
                tree="dist_eval_tree", classes=MVM_CLASSES_X),
    "axes": dict(script="ref_train_axes_s{seed}.py",
                 ckpt="axes_s{seed}/{label}_best.pth",
                 tree="axes_eval_big_tree", classes=AXES_LABELS),
}


def run_leg(fam: str, seed: int) -> None:
    spec = FAM[fam]
    out_path = os.path.join(OUT, f"ref_{fam}_s{seed}_eval.json")
    if os.path.exists(out_path):
        print(f"[queue] {fam} s{seed}: cell exists, skipping", flush=True)
        return

    prep_ref(SCRATCH, seed=seed)
    script = os.path.join(SCRATCH, spec["script"].format(seed=seed))
    log_dir = os.path.join(SCRATCH, "logs")
    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(log_dir, f"{fam}_s{seed}.log")

    # the torch scripts neither need nor want the axon JAX plugin; a clean
    # PYTHONPATH pointing at the reference repo is the intended environment
    env = dict(os.environ, PYTHONPATH="/root/reference", MPLBACKEND="Agg")
    t0 = time.time()
    print(f"[queue] {fam} s{seed}: training ({script})", flush=True)
    with open(log_path, "w") as log:
        subprocess.run([sys.executable, "-u", script], cwd=SCRATCH, env=env,
                       check=True, stdout=log, stderr=subprocess.STDOUT)
    mins = (time.time() - t0) / 60
    print(f"[queue] {fam} s{seed}: trained in {mins:.1f} min", flush=True)

    res = os.path.join(SCRATCH, "ref_results")
    tree = os.path.join(DATA_ROOT, spec["tree"])
    if fam == "axes":
        cell = {
            label: eval_torch(
                os.path.join(res, spec["ckpt"].format(seed=seed, label=label)),
                tree, "axes", [label], 1024)
            for label in AXES_LABELS
        }
        shown = {l: round(c["mean_angular_error_deg"], 2)
                 for l, c in cell.items()}
    else:
        cell = eval_torch(os.path.join(res, spec["ckpt"].format(seed=seed)),
                          tree, fam, spec["classes"], 1024)
        shown = {"loss": round(cell["loss"], 4),
                 "ang": round(cell["mean_angular_error_deg"], 2)}
    with open(out_path, "w") as f:
        json.dump(cell, f, indent=2)
    print(f"[queue] {fam} s{seed}: cell -> {out_path} {shown}", flush=True)


def main(argv):
    jobs = []
    for a in argv:
        fam, seed = a.split(":")
        if fam not in FAM:
            raise SystemExit(f"unknown family {fam!r}")
        jobs.append((fam, int(seed)))
    print(f"[queue] {len(jobs)} jobs: {jobs}", flush=True)
    for fam, seed in jobs:
        run_leg(fam, seed)
    print("[queue] done", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
