"""MNIST pipeline (reference: hyperbolic_vae/datasets/mnist_v2.py).

Loads the standard IDX files from ``data_dir`` if present (this container
has no network egress, so no auto-download — point ``data_dir`` at an
existing copy). Otherwise ``synthetic=True`` builds a seeded synthetic
stand-in: 10 class-prototype blob images + noise in [0, 1], same shapes
and split semantics, so every experiment/test/bench runs hermetically.

Reference parity notes:
  * values in [0, 1] via ToTensor (mnist_v2.py:12-14); the commented-out
    pad-to-32 (mnist_v2.py:11) is resolved the way script _8 does — image
    shape is data-driven 28x28 (SURVEY section 2.5 flags the mismatch).
  * 90/10 train/val split, seed 42 (mnist_v2.py:15-19); batch 256
    default (mnist_v2.py:26).
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import numpy as np

from hyperbolic_vae_tpu.data.core import ArrayDataModule, split_train_val


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def _find(data_dir: Path, stem: str) -> Path | None:
    for suffix in ("", ".gz"):
        p = data_dir / (stem + suffix)
        if p.exists():
            return p
    return None


def load_mnist_arrays(data_dir) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    data_dir = Path(data_dir)
    names = {
        "x_train": "train-images-idx3-ubyte",
        "y_train": "train-labels-idx1-ubyte",
        "x_test": "t10k-images-idx3-ubyte",
        "y_test": "t10k-labels-idx1-ubyte",
    }
    found = {k: _find(data_dir, v) or _find(data_dir / "MNIST" / "raw", v) for k, v in names.items()}
    missing = [names[k] for k, v in found.items() if v is None]
    if missing:
        raise FileNotFoundError(
            f"MNIST IDX files not found under {data_dir}: {missing}. "
            "This container has no network egress; provide the files or use synthetic=True."
        )
    x_train = _read_idx(found["x_train"]).astype(np.float32) / 255.0
    y_train = _read_idx(found["y_train"]).astype(np.int32)
    x_test = _read_idx(found["x_test"]).astype(np.float32) / 255.0
    y_test = _read_idx(found["y_test"]).astype(np.int32)
    return x_train[..., None], y_train, x_test[..., None], y_test


def synthetic_mnist_arrays(
    n_train: int = 60000, n_test: int = 10000, seed: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Seeded digit-like data: each class is a smooth random prototype
    (low-frequency blob pattern) + per-sample jitter, clipped to [0, 1].
    Classes are linearly separable enough that latent-space scatter plots
    show the 10 clusters, like the reference figures."""
    rng = np.random.default_rng(seed)
    protos = []
    yy, xx = np.mgrid[0:28, 0:28] / 27.0
    for k in range(10):
        acc = np.zeros((28, 28), np.float32)
        for _ in range(3):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            sx, sy = rng.uniform(0.08, 0.25, 2)
            acc += np.exp(-((xx - cx) ** 2 / (2 * sx**2) + (yy - cy) ** 2 / (2 * sy**2)))
        protos.append(acc / acc.max())
    protos = np.stack(protos)  # (10, 28, 28)

    def make(n, seed_offset):
        r = np.random.default_rng(seed + seed_offset)
        y = r.integers(0, 10, n).astype(np.int32)
        shift = r.normal(0, 1.0, (n, 2)).astype(np.int64)
        noise = r.normal(0, 0.08, (n, 28, 28)).astype(np.float32)
        # vectorized per-sample circular translation (roll): out[i] = in[(i - s) % 28]
        imgs = protos[y]
        grid = np.arange(28)
        r_idx = (grid[None, :] - shift[:, 0:1]) % 28
        c_idx = (grid[None, :] - shift[:, 1:2]) % 28
        x = imgs[np.arange(n)[:, None, None], r_idx[:, :, None], c_idx[:, None, :]]
        x = np.clip(x + noise, 0.0, 1.0).astype(np.float32)
        return x[..., None], y

    x_train, y_train = make(n_train, 1)
    x_test, y_test = make(n_test, 2)
    return x_train, y_train, x_test, y_test


def make_data_module(
    batch_size: int = 256,
    data_dir: str = "data",
    synthetic: bool = False,
    n_train: int = 60000,
    n_test: int = 10000,
    seed: int = 42,
) -> ArrayDataModule:
    """Factory matching the reference's make_data_module(batch_size, ...)
    (mnist_v2.py:30-38): 90/10 train/val split of the train set, seed 42."""
    if synthetic:
        x_tr, y_tr, x_te, y_te = synthetic_mnist_arrays(n_train, n_test)
    else:
        x_tr, y_tr, x_te, y_te = load_mnist_arrays(data_dir)
    x_train, y_train, x_val, y_val = split_train_val(x_tr, y_tr, 0.1, seed)
    return ArrayDataModule(
        x_train=x_train,
        y_train=y_train,
        x_val=x_val,
        y_val=y_val,
        x_test=x_te,
        y_test=y_te,
        batch_size=batch_size,
        label_names=[str(i) for i in range(10)],
        name="mnist-synthetic" if synthetic else "mnist",
    )
