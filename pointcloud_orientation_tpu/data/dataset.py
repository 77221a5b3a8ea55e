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
    arrays consumed by the on-device GT synthesis.

    ``targets`` optionally carries *stored* ground truth imported from the
    reference's sidecar files (keys matching the pipeline's batch dict:
    ``axes``, ``forward``, ``probs_8dir``, ``vm_mu``, ``vm_kappa``,
    ``mvm_mu``, ``mvm_kappa``, ``mvm_weight``, ``mvm_k``). When present and
    training runs with ``rotation_mode='none'``, the trainer uses these
    instead of synthesizing GT from a sampled rotation — i.e. training on a
    pre-rotated reference dataset exactly as its dataloaders do
    (`dataloader.py`, `dataloader_*_vonMises.py`, `dataloader_8dir_sampled.py`).
    """

    points: np.ndarray  # (S, M, 3) float32
    labels: np.ndarray  # (S,) int32
    class_names: List[str]
    targets: Optional[dict] = None

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
        cls,
        root: str,
        num_points: int,
        classes: Optional[Sequence[str]] = None,
        load_sidecars: bool = False,
        max_k: int = 4,
    ) -> "OrientationDataset":
        """Import a reference-layout PLY tree (``root/<class>/*.ply``),
        resampling every cloud to ``num_points`` so the pack is rectangular.

        With ``load_sidecars=True`` the GT sidecar files next to each PLY
        (axes ``.txt``, ``_8dir.txt``, ``_single_peak_vM_gt.txt``,
        ``_multi_peak_vM_gt.txt``) are packed into ``targets`` so training
        can consume a pre-rotated reference dataset directly
        (``rotation_mode='none'``). Missing-file fallbacks mirror the
        reference dataloaders (uniform 8-dir, (0,0) vM).
        """
        import os

        from .sidecar import (
            read_8dir_txt,
            read_axes_txt,
            read_multi_peak_vm_txt,
            read_single_peak_vm_txt,
        )

        rng = np.random.default_rng(0)
        names = sorted(
            d
            for d in os.listdir(root)
            if not d.startswith(".") and os.path.isdir(os.path.join(root, d))
        )
        if classes is not None:
            names = [n for n in names if n in set(classes)]
        clouds, labels = [], []
        tg = {
            "axes": [], "probs_8dir": [], "vm_mu": [], "vm_kappa": [],
            "mvm_mu": [], "mvm_kappa": [], "mvm_weight": [], "mvm_k": [],
        }
        # Collect every file first so the parse can go through the native
        # bulk reader (all host cores, GIL-free); the sampling RNG stream
        # is untouched because the iteration order below is unchanged.
        files = []
        for ci, name in enumerate(names):
            cdir = os.path.join(root, name)
            for fname in sorted(os.listdir(cdir)):
                if fname.endswith(".ply"):
                    files.append((ci, os.path.join(cdir, fname)))
        from .fastply import try_read_ply_bulk_native

        parsed = try_read_ply_bulk_native([p for _, p in files])
        for fi, (ci, path) in enumerate(files):
            pts = parsed[fi] if parsed is not None and parsed[fi] is not None \
                else read_ply(path)
            pts = pts[:, :3]
            if pts.shape[0] >= num_points:
                idx = rng.choice(pts.shape[0], num_points, replace=False)
            else:
                idx = rng.choice(pts.shape[0], num_points, replace=True)
            clouds.append(pts[idx].astype(np.float32))
            labels.append(ci)
            if not load_sidecars:
                continue
            stem = path[: -len(".ply")]
            try:
                axes = read_axes_txt(stem + ".txt")
            except (OSError, ValueError):
                axes = np.eye(3, dtype=np.float32)[[0, 1, 2]] * np.asarray(
                    [[-1], [1], [-1]], np.float32
                )
            tg["axes"].append(axes)
            try:
                probs = read_8dir_txt(stem + "_8dir.txt")
            except (OSError, ValueError):
                probs = np.full(8, 0.125, np.float32)
            tg["probs_8dir"].append(probs)
            mu, kappa = read_single_peak_vm_txt(stem + "_single_peak_vM_gt.txt")
            tg["vm_mu"].append(mu)
            tg["vm_kappa"].append(kappa)
            try:
                params, k = read_multi_peak_vm_txt(
                    stem + "_multi_peak_vM_gt.txt", max_k
                )
            except OSError:
                params, k = np.zeros((max_k, 3), np.float32), 0
            tg["mvm_mu"].append(params[:, 0])
            tg["mvm_kappa"].append(params[:, 1])
            tg["mvm_weight"].append(params[:, 2])
            tg["mvm_k"].append(k)
        targets = None
        if load_sidecars and clouds:
            targets = {k: np.asarray(v, dtype=np.float32) for k, v in tg.items()}
            targets["mvm_k"] = targets["mvm_k"].astype(np.int32)
            targets["forward"] = targets["axes"][:, 2]
        return cls(
            np.stack(clouds), np.asarray(labels, np.int32), list(names), targets
        )

    # ---------- views ----------

    def _take_targets(self, mask_or_idx) -> Optional[dict]:
        if self.targets is None:
            return None
        return {k: v[mask_or_idx] for k, v in self.targets.items()}

    def subset(self, idx: np.ndarray) -> "OrientationDataset":
        return OrientationDataset(
            self.points[idx], self.labels[idx], self.class_names,
            self._take_targets(idx),
        )

    def select_classes(self, classes: Sequence[str]) -> "OrientationDataset":
        """Restrict to the given categories, relabeling densely — the
        reference's per-label / 6-class-mixed training scopes."""
        keep = [self.class_names.index(c) for c in classes]
        remap = {old: new for new, old in enumerate(keep)}
        mask = np.isin(self.labels, keep)
        labels = np.asarray([remap[l] for l in self.labels[mask]], np.int32)
        return OrientationDataset(
            self.points[mask], labels, list(classes), self._take_targets(mask)
        )

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
