"""Packed in-memory dataset with deterministic splits and batch iteration.

Replaces the reference's per-script glob/shuffle/split/DataLoader boilerplate
(e.g. `train.py:151-163`) with one component. Splits reproduce the canonical
70/15/15 shuffle at seed 42 (SURVEY.md §5-config).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .gt import class_masks
from .hdf5 import load_modelnet_hdf5, synthetic_modelnet
from .ply import read_ply


def split_indices(
    n: int, seed: int = 42, fractions: Tuple[float, float] = (0.7, 0.15)
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shuffle ``range(n)`` and cut train/val/test at 70%/15%/15%.

    Parity: the per-script split logic (`train.py:151-160`,
    `train_8dir_KL.py:47-52`).
    """
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_tr = int(fractions[0] * n)
    n_va = int(fractions[1] * n)
    return order[:n_tr], order[n_tr : n_tr + n_va], order[n_tr + n_va :]


@dataclasses.dataclass
class OrientationDataset:
    """Canonical (un-rotated) clouds + labels, plus per-sample class behavior
    arrays consumed by the on-device GT synthesis."""

    points: np.ndarray  # (S, M, 3) float32
    labels: np.ndarray  # (S,) int32
    class_names: List[str]

    def __post_init__(self):
        uniform, symm, k = class_masks(self.class_names)
        self.uniform_mask = uniform[self.labels]
        self.symm_mask = symm[self.labels]
        self.k_spec = k[self.labels]

    def __len__(self) -> int:
        return self.points.shape[0]

    # ---------- constructors ----------

    @classmethod
    def from_hdf5(cls, dataset_dir: str, **kw) -> "OrientationDataset":
        pts, labels, names = load_modelnet_hdf5(dataset_dir, **kw)
        return cls(pts, labels, names)

    @classmethod
    def synthetic(cls, **kw) -> "OrientationDataset":
        pts, labels, names = synthetic_modelnet(**kw)
        return cls(pts, labels, names)

    @classmethod
    def from_ply_tree(
        cls, root: str, num_points: int, classes: Optional[Sequence[str]] = None
    ) -> "OrientationDataset":
        """Import a reference-layout PLY tree (``root/<class>/*.ply``),
        resampling every cloud to ``num_points`` so the pack is rectangular.
        """
        import os

        rng = np.random.default_rng(0)
        names = sorted(
            d
            for d in os.listdir(root)
            if not d.startswith(".") and os.path.isdir(os.path.join(root, d))
        )
        if classes is not None:
            names = [n for n in names if n in set(classes)]
        clouds, labels = [], []
        for ci, name in enumerate(names):
            cdir = os.path.join(root, name)
            for fname in sorted(os.listdir(cdir)):
                if not fname.endswith(".ply"):
                    continue
                pts = read_ply(os.path.join(cdir, fname))[:, :3]
                if pts.shape[0] >= num_points:
                    idx = rng.choice(pts.shape[0], num_points, replace=False)
                else:
                    idx = rng.choice(pts.shape[0], num_points, replace=True)
                clouds.append(pts[idx].astype(np.float32))
                labels.append(ci)
        return cls(np.stack(clouds), np.asarray(labels, np.int32), list(names))

    # ---------- views ----------

    def subset(self, idx: np.ndarray) -> "OrientationDataset":
        return OrientationDataset(self.points[idx], self.labels[idx], self.class_names)

    def select_classes(self, classes: Sequence[str]) -> "OrientationDataset":
        """Restrict to the given categories, relabeling densely — the
        reference's per-label / 6-class-mixed training scopes."""
        keep = [self.class_names.index(c) for c in classes]
        remap = {old: new for new, old in enumerate(keep)}
        mask = np.isin(self.labels, keep)
        labels = np.asarray([remap[l] for l in self.labels[mask]], np.int32)
        return OrientationDataset(self.points[mask], labels, list(classes))

    def split(
        self, seed: int = 42
    ) -> Tuple["OrientationDataset", "OrientationDataset", "OrientationDataset"]:
        tr, va, te = split_indices(len(self), seed)
        return self.subset(tr), self.subset(va), self.subset(te)

    # ---------- batching ----------

    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        pad_final: bool = True,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield ``(index_batch (B,), valid_mask (B,), epoch_fraction)``.

        The final partial batch is padded by wrapping (static shapes — one
        compiled program for every step) with ``valid_mask`` zeroed on the
        padding so losses/metrics can exclude it.
        """
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, n, batch_size):
            chunk = order[start : start + batch_size]
            valid = np.ones(len(chunk), np.float32)
            if len(chunk) < batch_size:
                if not pad_final:
                    continue
                pad = batch_size - len(chunk)
                wrap = np.tile(order, -(-pad // n))[:pad]
                chunk = np.concatenate([chunk, wrap])
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            yield chunk, valid, min((start + batch_size) / n, 1.0)

    def gather_host(self, idx: np.ndarray):
        """Host-side gather of one batch's raw arrays (cheap views/copies)."""
        return (
            self.points[idx],
            self.labels[idx],
            self.uniform_mask[idx],
            self.symm_mask[idx],
            self.k_spec[idx],
        )
