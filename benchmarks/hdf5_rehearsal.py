"""End-to-end rehearsal of the real-ModelNet40 ingest path (VERDICT r2 item 8).

No ModelNet40 archive can enter this machine (zero network egress), so this
script fabricates one in the EXACT on-disk layout the reference consumes
(`data_process/hdf5_process.py:50-63,120-126`: ``ply_data_train*.h5`` /
``ply_data_test*.h5`` with ``data`` (S, 2048, 3) float32 + ``label`` (S, 1)
uint8 keys, and a ``shape_names.txt``) from the synthetic clouds, then runs
the training CLI through ``--data hdf5:`` — proving the full command that
will run the day a real archive appears:

    python benchmarks/hdf5_rehearsal.py              # fabricate + train
    python -m pointcloud_orientation_tpu.train.run \
        --preset 8dir_kl --data hdf5:results/hdf5_rehearsal/archive \
        --epochs 20 --out results/hdf5_rehearsal/run

The fabricated archive is split across two train files (like the real
archive's ply_data_train0..4.h5) to exercise the multi-file concatenation.
Artifacts: results/hdf5_rehearsal/{archive,run,README.txt}; the .h5 files
are regenerable and gitignored, the run summary is committed.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "hdf5_rehearsal")
ARCHIVE = os.path.join(OUT, "archive")


def fabricate(archive: str = ARCHIVE) -> None:
    import h5py

    sys.path.insert(0, REPO)
    from pointcloud_orientation_tpu.data.hdf5 import synthetic_modelnet

    os.makedirs(archive, exist_ok=True)
    for split, seed, per_class, n_files in (("train", 42, 48, 2),
                                            ("test", 7, 16, 1)):
        pts, labels, names = synthetic_modelnet(
            seed=seed, samples_per_class=per_class, num_points=2048)
        order = np.random.default_rng(seed).permutation(len(pts))
        pts, labels = pts[order], labels[order]
        for i, (p, l) in enumerate(zip(np.array_split(pts, n_files),
                                       np.array_split(labels, n_files))):
            path = os.path.join(archive, f"ply_data_{split}{i}.h5")
            with h5py.File(path, "w") as f:
                f.create_dataset("data", data=p.astype(np.float32))
                f.create_dataset("label",
                                 data=l.reshape(-1, 1).astype(np.uint8))
            print(f"wrote {path}: data {p.shape} label {l.shape}")
    with open(os.path.join(archive, "shape_names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"shape_names.txt: {names}")


def main() -> None:
    fabricate()
    sys.path.insert(0, REPO)
    from pointcloud_orientation_tpu.train.run import main as train_main

    sys.argv = [
        "run", "--preset", "8dir_kl", "--data", f"hdf5:{ARCHIVE}",
        "--epochs", "20", "--out", os.path.join(OUT, "run"),
    ]
    train_main()


if __name__ == "__main__":
    main()
