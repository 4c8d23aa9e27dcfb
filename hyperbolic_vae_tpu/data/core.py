"""Array-based data modules.

The reference wraps torch Datasets in Lightning DataModules with
worker-process DataLoaders (/root/reference/hyperbolic_vae/datasets/).
On TPU the idiomatic design is the opposite: these datasets are small
(MNIST 47 MB, CIFAR 184 MB f32, RNA-seq ~600 MB), so the whole split is
staged ONCE into device HBM and batching happens INSIDE the jitted
epoch (random permutation + gather under `lax.scan`) — zero host<->device
traffic per step, no input pipeline to feed.

`ArrayDataModule` is the single container: numpy arrays per split plus
label metadata. Splits are produced by the same seeded generators the
reference uses (90/10 MNIST seed 42, mnist_v2.py:15-19; 70/15/15 RNA-seq
seed 42, jerby_arnon.py:231-249).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ArrayDataModule:
    """Container for train/val/test arrays. ``x_*`` float32, channels-last
    images (H, W, C) — TPU conv layout — or flat vectors; ``y_*`` int32
    labels (or -1 when unlabeled)."""

    x_train: np.ndarray
    y_train: np.ndarray
    x_val: np.ndarray
    y_val: np.ndarray
    x_test: np.ndarray
    y_test: np.ndarray
    batch_size: int = 256
    label_names: Optional[Sequence[str]] = None
    name: str = "dataset"

    @property
    def input_shape(self):
        return self.x_train.shape[1:]

    def steps_per_epoch(self, split: str = "train") -> int:
        n = len(getattr(self, f"x_{split}"))
        return n // self.batch_size if split == "train" else -(-n // self.batch_size)

    def __post_init__(self):
        for s in ("train", "val", "test"):
            x = getattr(self, f"x_{s}")
            y = getattr(self, f"y_{s}")
            assert len(x) == len(y), (s, len(x), len(y))


def split_train_val(
    x: np.ndarray, y: np.ndarray, val_fraction: float = 0.1, seed: int = 42
):
    """Seeded random split (reference: torch random_split seed 42,
    mnist_v2.py:15-19)."""
    rng = np.random.default_rng(seed)
    n = len(x)
    perm = rng.permutation(n)
    n_val = int(round(n * val_fraction))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    return x[train_idx], y[train_idx], x[val_idx], y[val_idx]


def split_three_way(
    x: np.ndarray,
    y: np.ndarray,
    fractions=(0.7, 0.15),
    seed: int = 42,
):
    """70/15/15 split (reference jerby_arnon.py:231-249, seed 42)."""
    rng = np.random.default_rng(seed)
    n = len(x)
    perm = rng.permutation(n)
    n_train = int(fractions[0] * n)
    n_val = int(fractions[1] * n)
    tr = perm[:n_train]
    va = perm[n_train : n_train + n_val]
    te = perm[n_train + n_val :]
    return (x[tr], y[tr]), (x[va], y[va]), (x[te], y[te])
