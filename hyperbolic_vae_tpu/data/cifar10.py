"""CIFAR-10 pipeline (reference: hyperbolic_vae/datasets/cifar10_v1.py / _v2.py).

Reads the standard python-pickle batches if present; seeded synthetic
fallback otherwise (no egress). Reference parity:
  * Normalize(0.5, 0.5) -> values in [-1, 1] (cifar10_v1.py:13-14) —
    pairs with the AE/VAE Tanh output head.
  * 45k/5k train/val split, seed 42 (cifar10_v1.py:20-24, cifar10_v2.py:9-12).
"""

from __future__ import annotations

import pickle
import tarfile
from pathlib import Path

import numpy as np

from hyperbolic_vae_tpu.data.core import ArrayDataModule, split_train_val


def _load_batch(raw: dict) -> tuple[np.ndarray, np.ndarray]:
    data = raw[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # NHWC
    labels = np.asarray(raw[b"labels"], dtype=np.int32)
    return data, labels


def load_cifar10_arrays(data_dir) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    data_dir = Path(data_dir)
    base = None
    for cand in (data_dir / "cifar-10-batches-py", data_dir):
        if (cand / "data_batch_1").exists():
            base = cand
            break
    if base is None:
        tar = data_dir / "cifar-10-python.tar.gz"
        if tar.exists():
            with tarfile.open(tar) as tf:
                tf.extractall(data_dir)
            base = data_dir / "cifar-10-batches-py"
        else:
            raise FileNotFoundError(
                f"CIFAR-10 batches not found under {data_dir}. "
                "No network egress; provide the files or use synthetic=True."
            )
    xs, ys = [], []
    for i in range(1, 6):
        with open(base / f"data_batch_{i}", "rb") as f:
            x, y = _load_batch(pickle.load(f, encoding="bytes"))
        xs.append(x)
        ys.append(y)
    x_train = np.concatenate(xs)
    y_train = np.concatenate(ys)
    with open(base / "test_batch", "rb") as f:
        x_test, y_test = _load_batch(pickle.load(f, encoding="bytes"))
    # ToTensor + Normalize(0.5, 0.5): [0,255] -> [-1, 1]
    norm = lambda a: (a.astype(np.float32) / 255.0 - 0.5) / 0.5
    return norm(x_train), y_train, norm(x_test), y_test


def synthetic_cifar10_arrays(n_train: int = 50000, n_test: int = 10000, seed: int = 0):
    """Class-prototype color blobs in [-1, 1], NHWC."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:32, 0:32] / 31.0
    protos = []
    for _ in range(10):
        img = np.zeros((32, 32, 3), np.float32)
        for ch in range(3):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            s = rng.uniform(0.1, 0.3)
            img[..., ch] = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s**2)))
        protos.append(img / img.max() * 2.0 - 1.0)
    protos = np.stack(protos)

    def make(n, off):
        r = np.random.default_rng(seed + off)
        y = r.integers(0, 10, n).astype(np.int32)
        x = protos[y] + r.normal(0, 0.15, (n, 32, 32, 3)).astype(np.float32)
        return np.clip(x, -1.0, 1.0).astype(np.float32), y

    x_tr, y_tr = make(n_train, 1)
    x_te, y_te = make(n_test, 2)
    return x_tr, y_tr, x_te, y_te


CIFAR10_LABELS = [
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
]


def make_data_module(
    batch_size: int = 256,
    data_dir: str = "data",
    synthetic: bool = False,
    n_train: int = 50000,
    n_test: int = 10000,
    seed: int = 42,
) -> ArrayDataModule:
    """45k/5k/10k, seed 42 (reference cifar10_v2.py:9-20)."""
    if synthetic:
        x_tr, y_tr, x_te, y_te = synthetic_cifar10_arrays(n_train, n_test)
    else:
        x_tr, y_tr, x_te, y_te = load_cifar10_arrays(data_dir)
    x_train, y_train, x_val, y_val = split_train_val(x_tr, y_tr, 0.1, seed)
    return ArrayDataModule(
        x_train=x_train,
        y_train=y_train,
        x_val=x_val,
        y_val=y_val,
        x_test=x_te,
        y_test=y_te,
        batch_size=batch_size,
        label_names=CIFAR10_LABELS,
        name="cifar10-synthetic" if synthetic else "cifar10",
    )
