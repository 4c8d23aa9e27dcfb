"""Data pipeline tests (replaces the reference's
tests/test_data/test_jerby_arnon.py with hermetic fixtures)."""

import numpy as np

from hyperbolic_vae_tpu.data import cifar10, jerby_arnon, mnist
from hyperbolic_vae_tpu.data.core import split_three_way, split_train_val


def test_mnist_synthetic_shapes_and_determinism():
    dm1 = mnist.make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    dm2 = mnist.make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    assert dm1.x_train.shape[1:] == (28, 28, 1)
    assert dm1.x_train.min() >= 0.0 and dm1.x_train.max() <= 1.0
    np.testing.assert_array_equal(dm1.x_train, dm2.x_train)  # seeded
    # 90/10 split (ref mnist_v2.py:15-19)
    total = len(dm1.x_train) + len(dm1.x_val)
    assert abs(len(dm1.x_val) - round(0.1 * total)) <= 1


def test_cifar10_synthetic_range():
    dm = cifar10.make_data_module(batch_size=32, synthetic=True, n_train=128, n_test=32)
    assert dm.x_train.shape[1:] == (32, 32, 3)
    assert dm.x_train.min() >= -1.0 and dm.x_train.max() <= 1.0
    assert dm.label_names[0] == "airplane"


def test_split_train_val_disjoint_and_seeded():
    x = np.arange(100)[:, None].astype(np.float32)
    y = np.arange(100, dtype=np.int32)
    xt, yt, xv, yv = split_train_val(x, y, 0.1, seed=42)
    assert len(xv) == 10 and len(xt) == 90
    assert set(yv).isdisjoint(set(yt))
    xt2, _, xv2, _ = split_train_val(x, y, 0.1, seed=42)
    np.testing.assert_array_equal(xt, xt2)


def test_split_three_way_fractions():
    x = np.arange(200)[:, None].astype(np.float32)
    y = np.arange(200, dtype=np.int32)
    (xt, yt), (xv, yv), (xe, ye) = split_three_way(x, y, seed=42)
    assert len(xt) == 140 and len(xv) == 30 and len(xe) == 30
    assert set(yt) | set(yv) | set(ye) == set(range(200))


def test_fake_rnaseq_schema_and_seed():
    x1, ct1, genes, cells = jerby_arnon.make_fake_arrays(50, 30)
    x2, ct2, _, _ = jerby_arnon.make_fake_arrays(50, 30)
    np.testing.assert_array_equal(x1, x2)  # seeded Poisson (ref :205)
    assert x1.shape == (50, 30)
    assert genes[0] == "gene_00000" and cells[0] == "cell_0"
    assert set(ct1) <= set(jerby_arnon.nice_to_weirds)


def test_rnaseq_normalization_methods():
    x = np.abs(np.random.default_rng(0).normal(5, 2, (20, 10)).astype(np.float32))
    s1 = jerby_arnon.normalize_rnaseq(x, "sum_to_one")
    np.testing.assert_allclose(s1.sum(1), 1.0, rtol=1e-5)
    sm = jerby_arnon.normalize_rnaseq(x, "sum_to_million")
    np.testing.assert_allclose(sm.sum(1), 1e6, rtol=1e-4)
    z = jerby_arnon.normalize_rnaseq(x, "z_score")
    np.testing.assert_allclose(z.mean(0), 0.0, atol=1e-5)
    # ddof=0: scipy.stats.zscore default, matched per round-1 ADVICE
    np.testing.assert_allclose(z.std(0, ddof=0), 1.0, rtol=1e-4)
    assert jerby_arnon.normalize_rnaseq(x, None) is x


def test_gene_and_cell_filters():
    x = np.ones((10, 4), np.float32)
    x[:, 1] = 0.0  # all-zero gene
    genes = ["MT-CO1", "GENE_A", "GENE_B", "GENE_C"]
    xf, gf = jerby_arnon.filter_gene_symbols(x, genes)
    assert "MT-CO1" not in gf and "GENE_A" not in gf  # MT dropped, zero dropped
    assert xf.shape == (10, 2)
    x2 = np.zeros((5, 10), np.float32)
    x2[0] = 1.0
    ann = np.arange(5)
    xc, annc = jerby_arnon.filter_single_cells(x2, ann)
    assert len(xc) == 1 and annc[0] == 0


def test_rnaseq_data_module_fake():
    dm = jerby_arnon.make_rnaseq_data_module(batch_size=16, fake=True, n_samples=100, n_genes=40)
    assert dm.x_train.shape == (70, 40)
    assert dm.x_val.shape == (15, 40)
    assert dm.x_test.shape == (15, 40)
    assert dm.label_names is not None


def test_cell_type_vocabulary_map():
    assert jerby_arnon.weird_to_nice["Mal"] == "Malignant"
    assert jerby_arnon.weird_to_nice["T cells CD8"] == "T CD8"
    assert jerby_arnon.weird_to_nice["Endo."] == "Endothelial"


def test_parquet_split_roundtrip(tmp_path):
    """prepare -> parquet splits -> load (the flow the reference's
    jerby_arnon_other.py never finished)."""
    import pandas as pd

    from hyperbolic_vae_tpu.data import jerby_arnon as ja
    from hyperbolic_vae_tpu.data.jerby_arnon_parquet import (
        load_parquet_data_module,
        save_split_parquet_datasets,
    )

    # synthesize the CSV layout from the fake factory
    x, cell_types, genes, cells = ja.make_fake_arrays(60, 25)
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    pd.DataFrame(
        {"cells": cells, "cell.types": cell_types, "samples": ["s"] * 60}
    ).to_csv(csv_dir / "annotations.csv", index=False)
    tpm = pd.DataFrame(x.T, index=pd.Index(genes, name="g"), columns=cells)
    tpm.to_csv(csv_dir / "tpm.csv")

    pq_dir = tmp_path / "pq"
    save_split_parquet_datasets(csv_dir, pq_dir)
    dm = load_parquet_data_module(pq_dir, batch_size=8)
    assert len(dm.x_train) == 36 and len(dm.x_val) == 12 and len(dm.x_test) == 12
    assert dm.x_train.shape[1] == dm.x_val.shape[1] == dm.x_test.shape[1]
    assert np.isfinite(dm.x_train).all()
    assert set(dm.y_train) <= set(range(len(dm.label_names)))


def test_zscore_matches_scipy_default_ddof():
    """Reference normalizes with scipy.stats.zscore (ddof=0); round-1 used
    ddof=1 (ADVICE)."""
    from hyperbolic_vae_tpu.data.jerby_arnon import normalize_rnaseq

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 10, (13, 5)).astype(np.float32)
    got = normalize_rnaseq(x, "z_score")
    exp = (x - x.mean(0)) / x.std(0, ddof=0)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_fake_rnaseq_structured_markers():
    """structured=True: each type's marker-gene module has elevated mean;
    the default (reference-parity) path is unchanged by the option."""
    x, ct, _, _ = jerby_arnon.make_fake_arrays(600, 200, structured=True)
    types = list(jerby_arnon.nice_to_weirds)
    module = 200 // 20
    t0 = types[0]
    mask = np.asarray(ct) == t0
    assert mask.sum() > 10
    marker_mean = x[mask, 0:module].mean()
    background_mean = x[mask, module : 2 * module].mean()
    assert marker_mean > 2.0 * background_mean  # 300 vs 100 Poisson rates
    x_default, _, _, _ = jerby_arnon.make_fake_arrays(50, 30)
    x_default2, _, _, _ = jerby_arnon.make_fake_arrays(50, 30, structured=False)
    np.testing.assert_array_equal(x_default, x_default2)
