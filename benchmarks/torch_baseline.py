"""Measure the reference-equivalent PyTorch CPU throughput.

A from-spec reimplementation of the reference workload (PointNet++ backbone
with the 8-direction head, soft-label-KL objective — see SURVEY.md §2.2) in
idiomatic torch, used only to produce the ``vs_baseline`` denominator for
``bench.py``. Run:

    python benchmarks/torch_baseline.py [--points 1024] [--batch 64]

Writes ``benchmarks/baseline_torch.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import torch
import torch.nn.functional as F
from torch import nn


class SAStage(nn.Module):
    """Set abstraction: random centroids -> kNN group -> shared MLP -> max."""

    def __init__(self, n_centroids, n_neighbors, c_in, widths):
        super().__init__()
        self.n_centroids = n_centroids
        self.n_neighbors = n_neighbors
        layers = []
        prev = c_in + 3
        for w in widths:
            layers += [nn.Conv2d(prev, w, 1), nn.BatchNorm2d(w), nn.ReLU()]
            prev = w
        self.mlp = nn.Sequential(*layers)

    def forward(self, xyz, feats):
        B, N, _ = xyz.shape
        if self.n_centroids is None:  # group all
            grouped = xyz.unsqueeze(1)
            if feats is not None:
                grouped = torch.cat([grouped, feats.unsqueeze(1)], -1)
            new_xyz = xyz.new_zeros(B, 1, 3)
        else:
            sel = torch.stack(
                [torch.randperm(N)[: self.n_centroids] for _ in range(B)]
            )
            new_xyz = torch.gather(xyz, 1, sel.unsqueeze(-1).expand(-1, -1, 3))
            d = torch.cdist(new_xyz, xyz) ** 2
            knn = d.topk(self.n_neighbors, largest=False).indices
            flat = knn.reshape(B, -1, 1)
            g_xyz = torch.gather(xyz, 1, flat.expand(-1, -1, 3)).reshape(
                B, self.n_centroids, self.n_neighbors, 3
            )
            grouped = g_xyz - new_xyz.unsqueeze(2)
            if feats is not None:
                C = feats.shape[-1]
                g_f = torch.gather(feats, 1, flat.expand(-1, -1, C)).reshape(
                    B, self.n_centroids, self.n_neighbors, C
                )
                grouped = torch.cat([grouped, g_f], -1)
        h = self.mlp(grouped.permute(0, 3, 1, 2))
        return new_xyz, h.max(dim=3).values.permute(0, 2, 1)


class TorchPP8Dir(nn.Module):
    def __init__(self):
        super().__init__()
        self.s1 = SAStage(128, 32, 0, [64, 64, 128])
        self.s2 = SAStage(32, 32, 128, [128, 128, 256])
        self.s3 = SAStage(None, None, 256, [256, 512, 1024])
        self.head = nn.Sequential(
            nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
            nn.Dropout(0.5), nn.Linear(256, 8),
        )

    def forward(self, pts):
        xyz, f = self.s1(pts, None)
        xyz, f = self.s2(xyz, f)
        _, f = self.s3(xyz, f)
        return self.head(f.flatten(1))


def measure(batch=64, points=1024, budget_s=60.0):
    torch.manual_seed(0)
    model = TorchPP8Dir()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.randn(batch, points, 3)
    target = torch.softmax(torch.randn(batch, 8), dim=1)

    def train_step():
        opt.zero_grad()
        logits = model(x)
        loss = -(target * F.log_softmax(logits, 1)).sum(1).mean()
        loss.backward()
        opt.step()

    def eval_step():
        with torch.no_grad():
            model(x)

    model.train()
    train_step()  # warmup
    t0 = time.perf_counter()
    n_train = 0
    while time.perf_counter() - t0 < budget_s / 2 and n_train < 20:
        train_step()
        n_train += 1
    t_train = time.perf_counter() - t0

    model.eval()
    eval_step()  # warmup
    t0 = time.perf_counter()
    n_eval = 0
    while time.perf_counter() - t0 < budget_s / 2 and n_eval < 20:
        eval_step()
        n_eval += 1
    t_eval = time.perf_counter() - t0

    clouds = batch * (n_train + n_eval)
    return {
        "clouds_per_sec": clouds / (t_train + t_eval),
        "train_clouds_per_sec": batch * n_train / t_train,
        "eval_clouds_per_sec": batch * n_eval / t_eval,
        "batch": batch,
        "points": points,
        "device": "cpu",
        "torch_version": torch.__version__,
        "threads": torch.get_num_threads(),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--budget", type=float, default=60.0)
    args = ap.parse_args()
    result = measure(args.batch, args.points, args.budget)
    out = os.path.join(os.path.dirname(__file__), "baseline_torch.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
