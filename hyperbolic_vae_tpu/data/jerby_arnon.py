"""Jerby-Arnon melanoma scRNA-seq (GSE115978) pipeline.

Re-implements /root/reference/hyperbolic_vae/datasets/jerby_arnon.py:
CSV readers (pyarrow engine), cell-type vocabulary normalization, gene
and cell filters, normalization methods, the seeded fake-data factory
(the reference's one real test fixture, jerby_arnon.py:199-219) and the
70/15/15 seeded split (jerby_arnon.py:231-249).

Downloads are impossible here (zero egress): ``download_csv_files``
exists for API parity and raises with a clear message when offline.
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace

import numpy as np

from hyperbolic_vae_tpu.data.core import ArrayDataModule, split_three_way

ANNOTATIONS_CSV_GZ_URL = (
    "https://ftp.ncbi.nlm.nih.gov/geo/series/GSE115nnn/GSE115978/suppl/"
    "GSE115978%5Fcell.annotations.csv.gz"
)
COUNTS_CSV_GZ_URL = (
    "https://ftp.ncbi.nlm.nih.gov/geo/series/GSE115nnn/GSE115978/suppl/"
    "GSE115978%5Fcounts.csv.gz"
)
TPM_CSV_GZ_URL = (
    "https://ftp.ncbi.nlm.nih.gov/geo/series/GSE115nnn/GSE115978/suppl/"
    "GSE115978%5Ftpm.csv.gz"
)

columns = SimpleNamespace(
    CELL_TYPE="cell_type",
    GENE_SYMBOL="gene_symbol",
    SAMPLE_ID="sample_id",
    SINGLE_CELL_ID="single_cell_id",
)

# cell-type vocabulary normalization (reference jerby_arnon.py:38-54)
nice_to_weirds = {
    "Malignant": ["Malignant.cell", "Mal", "Malignant cell"],
    "Endothelial": ["Endothelial.cell", "Endothelial cells", "Endo.", "Endothelial cell"],
    "CAF": [],
    "T CD8": ["T.CD8", "T cells CD8", "TCD8"],
    "NK": ["NK cells"],
    "Macrophage": ["Macrophages"],
    "T CD4": ["T.CD4", "T cells CD4", "TCD4"],
    "B": ["B.cell", "B cells", "B cell"],
    "T": ["T.cell", "T cell"],
}
weird_to_nice = {w: nice for nice, ws in nice_to_weirds.items() for w in ws}
CELL_TYPES = list(nice_to_weirds) + ["Unknown"]


def normalize_rnaseq(x: np.ndarray, method: str | None) -> np.ndarray:
    """(n_cells, n_genes) float array normalization
    (reference jerby_arnon.py:97-106). ``None`` / ``"counts"`` is the
    raw-counts path (what RNASeqVAE(recon='nb') expects)."""
    if method is None or method == "counts":
        return x
    if method == "sum_to_one":
        return x / np.maximum(x.sum(axis=1, keepdims=True), 1e-12)
    if method == "sum_to_million":
        return x / np.maximum(x.sum(axis=1, keepdims=True), 1e-12) * 1_000_000
    if method == "z_score":
        mu = x.mean(axis=0, keepdims=True)
        # ddof=0 matches scipy.stats.zscore's default (the reference's call)
        sd = x.std(axis=0, keepdims=True, ddof=0)
        return (x - mu) / np.maximum(sd, 1e-12)
    raise ValueError(f"rnaseq_normalize_method {method} not recognized")


def filter_gene_symbols(x: np.ndarray, gene_symbols: list[str]):
    """Drop mitochondrial (MT*) genes and genes >90% zero
    (reference jerby_arnon.py:153-164)."""
    genes = np.asarray(gene_symbols)
    keep = ~np.char.startswith(genes.astype(str), "MT")
    zero_rate = (x == 0).mean(axis=0)
    keep &= zero_rate <= 0.9
    return x[:, keep], [g for g, k in zip(gene_symbols, keep) if k]


def filter_single_cells(x: np.ndarray, annotations: np.ndarray):
    """Drop cells with >90% zero expression (reference jerby_arnon.py:167-174)."""
    keep = (x == 0).mean(axis=1) <= 0.9
    return x[keep], annotations[keep]


def read_annotations(path_csv) -> "pandas.DataFrame":
    """Cells as rows; renames columns, maps '?' cell types to Unknown,
    normalizes the vocabulary, sorts by cell id
    (reference jerby_arnon.py:109-131)."""
    import pandas as pd

    df = pd.read_csv(path_csv, na_values={"cell.types": "?"})
    df = df.rename(
        columns={
            "cells": columns.SINGLE_CELL_ID,
            "cell.types": columns.CELL_TYPE,
            "samples": columns.SAMPLE_ID,
        }
    )
    df[columns.CELL_TYPE] = df[columns.CELL_TYPE].fillna("Unknown")
    df[columns.CELL_TYPE] = df[columns.CELL_TYPE].replace(weird_to_nice)
    df = df.set_index(columns.SINGLE_CELL_ID, drop=False).sort_index()
    return df


def read_tpm(path_csv, skiprows=None, use_native: bool = True) -> "pandas.DataFrame":
    """Genes-as-rows CSV -> cells-as-rows DataFrame, sorted both axes
    (reference jerby_arnon.py:134-150). Uses the multithreaded C++ parser
    (native/csv_etl.cpp) for the numeric block when built; pandas/pyarrow
    otherwise."""
    import pandas as pd

    if skiprows is None and use_native:
        from hyperbolic_vae_tpu.data import native

        if native.is_available():
            try:
                with open(path_csv) as f:
                    header = f.readline().rstrip("\n").split(",")
                    index = [line.split(",", 1)[0] for line in f]
                values = native.read_csv_matrix(path_csv)
                cell_ids = header[1:] if len(header) - 1 == values.shape[1] else header
                df = pd.DataFrame(values, index=index, columns=cell_ids)
                df = df.rename_axis(index=columns.GENE_SYMBOL, columns=columns.SINGLE_CELL_ID)
                df = df.sort_index(axis="columns").sort_index(axis="index")
                return df.T
            except RuntimeError as e:
                # malformed/ragged CSV the native parser refuses: fall back
                # to pandas rather than failing the whole load
                import logging

                logging.getLogger(__name__).warning(
                    "native CSV parse failed (%s); falling back to pandas", e
                )
    if skiprows is None:
        df = pd.read_csv(path_csv, engine="pyarrow", index_col=0)
    else:
        df = pd.read_csv(path_csv, index_col=0, skiprows=skiprows)
    df = df.rename_axis(index=columns.GENE_SYMBOL, columns=columns.SINGLE_CELL_ID)
    df = df.sort_index(axis="columns").sort_index(axis="index")
    return df.T


def make_fake_arrays(n_samples: int = 1000, n_genes: int = 2000, seed: int = 42,
                     structured: bool = False):
    """Seeded Poisson(100) counts with the real schema — the reference's
    fake-data factory (jerby_arnon.py:199-219).

    ``structured=True`` is a DELIBERATE extension beyond the reference:
    each cell type gets its own module of ~n_genes/20 marker genes whose
    Poisson rate is elevated 3x, so a latent model that works separates
    the types (the reference's flat-Poisson fake carries zero type
    signal, which makes latent figures on it uninformative)."""
    rng = np.random.default_rng(seed)
    types = list(nice_to_weirds)
    if structured:
        cell_types = rng.choice(types, size=n_samples)
        module = max(n_genes // 20, 1)
        rates = np.full((len(types), n_genes), 100.0)
        for t in range(len(types)):
            lo = (t * module) % max(n_genes - module, 1)
            rates[t, lo : lo + module] = 300.0
        type_idx = np.array([types.index(t) for t in cell_types])
        x = rng.poisson(rates[type_idx]).astype(np.float32)
    else:
        # draw order (x, then labels) preserved from the original factory
        # so the default seeded values stay bit-identical across versions
        x = rng.poisson(100, size=(n_samples, n_genes)).astype(np.float32)
        cell_types = rng.choice(types, size=n_samples)
    gene_symbols = [f"gene_{i:05d}" for i in range(n_genes)]
    cell_ids = [f"cell_{i}" for i in range(n_samples)]
    return x, cell_types, gene_symbols, cell_ids


def load_jerby_arnon_arrays(data_dir, rnaseq_normalize_method: str | None = "z_score"):
    """Full real-data path: annotations + TPM CSVs -> filtered, normalized
    (n_cells, n_genes) float32 + integer cell-type labels."""
    data_dir = Path(data_dir)
    ann_path = data_dir / "annotations.csv"
    tpm_path = data_dir / "tpm.csv"
    if not (ann_path.exists() and tpm_path.exists()):
        raise FileNotFoundError(
            f"Jerby-Arnon CSVs not found in {data_dir} (need annotations.csv, tpm.csv). "
            "No network egress; run scripts/download on a connected machine or use the fake dataset."
        )
    ann = read_annotations(ann_path)
    tpm = read_tpm(tpm_path)
    # align cells present in both
    common = tpm.index.intersection(ann.index)
    tpm = tpm.loc[common]
    ann = ann.loc[common]
    x = tpm.to_numpy(dtype=np.float32)
    x, genes = filter_gene_symbols(x, list(tpm.columns))
    x = normalize_rnaseq(x, rnaseq_normalize_method).astype(np.float32)
    cell_types = ann[columns.CELL_TYPE].to_numpy()
    return x, cell_types, genes


def get_subset_dataset(
    data_dir,
    n_samples: int = 10,
    genes_keep_one_in: int = 100,
    rnaseq_normalize_method: str | None = "sum_to_one",
):
    """Cheap subset for interactive work: every Nth gene row, first
    n_samples cells (reference get_subset_jerby_arnon_dataset,
    jerby_arnon.py:185-196). Returns (x, cell_types, genes)."""
    data_dir = Path(data_dir)
    ann = read_annotations(data_dir / "annotations.csv")
    tpm = read_tpm(data_dir / "tpm.csv", skiprows=lambda i: i % genes_keep_one_in)
    x = tpm.to_numpy(dtype=np.float32)
    x, genes = filter_gene_symbols(x, list(tpm.columns))
    keep = ann.index[:n_samples]
    mask = tpm.index.isin(keep)
    x = normalize_rnaseq(x[mask], rnaseq_normalize_method).astype(np.float32)
    return x, ann.loc[tpm.index[mask], columns.CELL_TYPE].to_numpy(), genes


def _labels_to_int(cell_types) -> tuple[np.ndarray, list[str]]:
    vocab = sorted(set(map(str, cell_types)))
    index = {v: i for i, v in enumerate(vocab)}
    return np.asarray([index[str(c)] for c in cell_types], dtype=np.int32), vocab


def make_rnaseq_data_module(
    batch_size: int = 64,
    data_dir: str | None = None,
    fake: bool = False,
    n_samples: int = 1000,
    n_genes: int = 2000,
    rnaseq_normalize_method: str | None = "z_score",
    seed: int = 42,
    structured_fake: bool = False,
) -> ArrayDataModule:
    """70/15/15 split, seed 42 (reference jerby_arnon.py:231-249)."""
    if fake or data_dir is None:
        x, cell_types, _, _ = make_fake_arrays(n_samples, n_genes,
                                               structured=structured_fake)
        x = normalize_rnaseq(x, rnaseq_normalize_method).astype(np.float32)
    else:
        x, cell_types, _ = load_jerby_arnon_arrays(data_dir, rnaseq_normalize_method)
    y, vocab = _labels_to_int(cell_types)
    (x_tr, y_tr), (x_va, y_va), (x_te, y_te) = split_three_way(x, y, seed=seed)
    return ArrayDataModule(
        x_train=x_tr,
        y_train=y_tr,
        x_val=x_va,
        y_val=y_va,
        x_test=x_te,
        y_test=y_te,
        batch_size=batch_size,
        label_names=vocab,
        name="jerby_arnon-fake" if (fake or data_dir is None) else "jerby_arnon",
    )


def download_csv_files(data_dir) -> None:
    """API-parity download helper (reference
    scripts/download_jerby_arnon_csv_files.py). Raises offline."""
    import gzip
    import io
    import urllib.request

    data_dir = Path(data_dir)
    data_dir.mkdir(parents=True, exist_ok=True)
    for url, name in [
        (ANNOTATIONS_CSV_GZ_URL, "annotations.csv"),
        (TPM_CSV_GZ_URL, "tpm.csv"),
    ]:
        with urllib.request.urlopen(url) as response:  # noqa: S310
            compressed = io.BytesIO(response.read())
        with gzip.open(compressed, "rb") as gz:
            (data_dir / name).write_bytes(gz.read())
