"""Native C++ ETL kernel vs pandas reference (skipped if not built)."""

import numpy as np
import pytest

from hyperbolic_vae_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native lib not built (make -C native)"
)


@pytest.fixture()
def small_csv(tmp_path):
    rng = np.random.default_rng(0)
    m = rng.uniform(0, 50, (40, 17)).astype(np.float32)
    p = tmp_path / "tpm.csv"
    with open(p, "w") as f:
        f.write(",".join([""] + [f"cell_{i}" for i in range(17)]) + "\n")
        for r in range(40):
            f.write(f"gene_{r}," + ",".join(f"{v:.5f}" for v in m[r]) + "\n")
    return p, m


def test_parse_matches_pandas(small_csv):
    import pandas as pd

    path, m = small_csv
    got = native.read_csv_matrix(path)
    exp = pd.read_csv(path, index_col=0).to_numpy(dtype=np.float32)
    np.testing.assert_allclose(got, exp, atol=1e-4)
    np.testing.assert_allclose(got, m, atol=1e-4)


def test_zscore_matches_numpy(small_csv):
    _, m = small_csv
    z = native.zscore_columns(m.copy(), ddof=1)
    exp = (m - m.mean(0)) / m.std(0, ddof=1)
    np.testing.assert_allclose(z, exp, atol=1e-5)


def test_read_tpm_native_matches_pandas(small_csv):
    from hyperbolic_vae_tpu.data.jerby_arnon import read_tpm

    path, _ = small_csv
    df_native = read_tpm(path, use_native=True)
    df_pandas = read_tpm(path, use_native=False)
    assert list(df_native.index) == list(df_pandas.index)
    assert list(df_native.columns) == list(df_pandas.columns)
    np.testing.assert_allclose(
        df_native.to_numpy(np.float32), df_pandas.to_numpy(np.float32), atol=1e-4
    )


def test_missing_values_parse_as_nan(tmp_path):
    """Empty and 'NA' fields must yield NaN, not fail the whole file
    (round-1 ADVICE: parse_float fallback used to return line_end)."""
    p = tmp_path / "na.csv"
    p.write_text("gene,c1,c2,c3\ng1,1.5,NA,3\ng2,,2.25e1,-4\n")
    m = native.read_csv_matrix(p)
    assert m.shape == (2, 3)
    assert np.isnan(m[0, 1]) and np.isnan(m[1, 0])
    np.testing.assert_allclose(
        [m[0, 0], m[0, 2], m[1, 1], m[1, 2]], [1.5, 3.0, 22.5, -4.0]
    )
