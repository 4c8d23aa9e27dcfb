"""Parquet-split data module for Jerby-Arnon.

Completes the reference's half-built JerbyArnonCSVDataModule
(/root/reference/hyperbolic_vae/datasets/jerby_arnon_other.py:57-88 —
its ``prepare_data`` writes 60/20/20 parquet splits and ``setup`` loads
them, but the *_dataloader methods were never written, SURVEY section
2.5). Here the same prepare/load pipeline feeds an ArrayDataModule.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from hyperbolic_vae_tpu.data.core import ArrayDataModule
from hyperbolic_vae_tpu.data.jerby_arnon import (
    columns,
    filter_gene_symbols,
    normalize_rnaseq,
    read_annotations,
    read_tpm,
)

logger = logging.getLogger(__name__)

SPLIT_FRACTIONS = (0.6, 0.2, 0.2)  # reference jerby_arnon_other.py:35-40


def save_split_parquet_datasets(
    csv_dir, parquet_dir, seed: int = 42, fractions=SPLIT_FRACTIONS
) -> None:
    """CSV -> filtered joint frame -> seeded 60/20/20 parquet splits
    (reference _save_split_parquet_datasets, jerby_arnon_other.py:25-46)."""
    import pandas as pd

    csv_dir, parquet_dir = Path(csv_dir), Path(parquet_dir)
    parquet_dir.mkdir(parents=True, exist_ok=True)
    ann = read_annotations(csv_dir / "annotations.csv")
    tpm = read_tpm(csv_dir / "tpm.csv")
    common = tpm.index.intersection(ann.index)
    tpm, ann = tpm.loc[common], ann.loc[common]
    x = tpm.to_numpy(dtype=np.float32)
    x, genes = filter_gene_symbols(x, list(tpm.columns))
    df = pd.DataFrame(x, index=tpm.index, columns=genes)
    df[columns.CELL_TYPE] = ann[columns.CELL_TYPE]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(df))
    n_train = int(fractions[0] * len(df))
    n_val = int(fractions[1] * len(df))
    splits = {
        "train": perm[:n_train],
        "val": perm[n_train : n_train + n_val],
        "test": perm[n_train + n_val :],
    }
    for name, idx in splits.items():
        df.iloc[idx].to_parquet(parquet_dir / f"{name}.parquet")
        logger.info("wrote %s split: %d rows", name, len(idx))


def load_parquet_data_module(
    parquet_dir,
    batch_size: int = 64,
    rnaseq_normalize_method: str | None = "z_score",
) -> ArrayDataModule:
    """Load the three parquet splits into an ArrayDataModule (the
    dataloader layer the reference never finished)."""
    import pandas as pd

    parquet_dir = Path(parquet_dir)
    arrays, labels = {}, {}
    vocab: list[str] = []
    for name in ("train", "val", "test"):
        df = pd.read_parquet(parquet_dir / f"{name}.parquet")
        cell_types = df.pop(columns.CELL_TYPE).astype(str)
        vocab = sorted(set(vocab) | set(cell_types))
        arrays[name] = df.to_numpy(dtype=np.float32)
        labels[name] = cell_types.to_numpy()
    index = {v: i for i, v in enumerate(vocab)}
    # normalization statistics from the train split only
    x_train = normalize_rnaseq(arrays["train"], rnaseq_normalize_method)
    return ArrayDataModule(
        x_train=x_train.astype(np.float32),
        y_train=np.asarray([index[c] for c in labels["train"]], np.int32),
        x_val=normalize_rnaseq(arrays["val"], rnaseq_normalize_method).astype(np.float32),
        y_val=np.asarray([index[c] for c in labels["val"]], np.int32),
        x_test=normalize_rnaseq(arrays["test"], rnaseq_normalize_method).astype(np.float32),
        y_test=np.asarray([index[c] for c in labels["test"]], np.int32),
        batch_size=batch_size,
        label_names=vocab,
        name="jerby_arnon-parquet",
    )
