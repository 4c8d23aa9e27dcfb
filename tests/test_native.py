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


# ---- adversarial inputs (round 5, VERDICT r4 #8): the native parser
# feeds the real-data RNA-seq path — every malformed-CSV shape must
# either parse IDENTICALLY to the pandas reader the reference relies on
# (/root/reference/hyperbolic_vae/datasets/jerby_arnon.py:134-150) or be
# rejected loudly. A silent mis-parse would poison every downstream
# RNA-seq result.


def _pandas_f32(path):
    import pandas as pd

    return pd.read_csv(path, index_col=0).to_numpy(dtype=np.float32)


@pytest.mark.parametrize(
    "name,text",
    [
        # CRLF line endings (Windows-exported CSV)
        ("crlf", "g,c1,c2\r\ng1,1.5,2.5\r\ng2,3.5,4.5\r\n"),
        # RFC-4180 quoting: embedded comma in the index column, quoted
        # numeric values, doubled-quote escape in the index
        ("quoted", 'g,c1,c2\n"g,1",1.5,"2.5"\n"g""2","3.5",4.5\n'),
        # whitespace padding around values
        ("spaces", "g,c1,c2\ng1, 1.5 ,2.5\ng2,3.5, 4.5\n"),
        # overflow to inf / denormal / double-denormal-underflow-to-zero,
        # f32-boundary magnitudes (pandas emits the same f32 cast)
        (
            "huge_denormal",
            "g,c1,c2\ng1,1e40,1e-45\ng2,-3e38,4.9e-324\n",
        ),
        # >18 significant digits exercises the dropped-digit slow path
        (
            "many_digits",
            "g,c1,c2\ng1,123456789012345678901.5,0.000123456789012345678901\n"
            "g2,1.5,2.5\n",
        ),
        # no final newline
        ("no_final_newline", "g,c1,c2\ng1,1.5,2.5\ng2,3.5,4.5"),
        # mix of quoted and quote-free rows: the per-row quote probe
        # (round-5 session-3: memchr fast path for quote-free rows) must
        # route each row through the right scan within one file
        (
            "mixed_quote_rows",
            'g,c1,c2\n"g,1","1.5",2.5\ng2,3.5,4.5\ng3,5.5,6.5\n',
        ),
        # uniform trailing delimiter: both readers see one extra all-NaN
        # column (pandas shifts the header but the VALUES agree)
        ("trailing_delim_all", "g,c1,c2\ng1,1.5,2.5,\ng2,3.5,4.5,\n"),
    ],
)
def test_adversarial_csv_matches_pandas(tmp_path, name, text):
    p = tmp_path / f"{name}.csv"
    p.write_bytes(text.encode())
    got = native.read_csv_matrix(p)
    exp = _pandas_f32(p)
    assert got.shape == exp.shape
    np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
    m = ~np.isnan(exp)
    np.testing.assert_array_equal(got[m], exp[m])  # exact f32 agreement


@pytest.mark.parametrize(
    "name,text,code",
    [
        # a row with FEWER value fields than the first data row: pandas
        # silently NaN-fills — we reject loudly instead (stricter is the
        # acceptable branch of the contract; silence is the bug)
        ("ragged_fewer", "g,c1,c2\ng1,1.5,2.5\ng2,3.5\n", "FEWER"),
        # a row with MORE fields (stray unquoted comma / trailing
        # delimiter on one row): column shift risk — reject loudly
        ("ragged_extra", "g,c1,c2\ng1,1.5,2.5\ng2,3.5,4.5,9.9\n", "MORE"),
        # a row missing the index column entirely
        ("ragged_noindex", "g,c1,c2\ng1,1.5,2.5\nnocommas\n", "index columns"),
        # embedded newline in a quoted LAST field: the physical-line
        # split can leave fragments whose field counts line up, so the
        # odd-quote-count (unterminated quote) check must reject loudly
        # (round-5 session-3 second review: this mis-parsed SILENTLY to
        # a 3x2 matrix while pandas reads 2x2)
        (
            "embedded_newline_quoted",
            'g,c1,c2\ng1,1.5,"a\nb,9,8"\ng2,3.5,4.5\n',
            "unterminated quote",
        ),
    ],
)
def test_ragged_rows_rejected_loudly(tmp_path, name, text, code):
    p = tmp_path / f"{name}.csv"
    p.write_text(text)
    with pytest.raises(RuntimeError, match=code):
        native.read_csv_matrix(p)


def test_junk_suffix_values_become_nan(tmp_path):
    """Fields with trailing junk after a valid prefix ('1.5x', '1.5 2.5')
    must NOT silently truncate-parse: they become NaN (pandas makes the
    column dtype object — a loud failure at to_numpy(float32); NaN is our
    per-value loud marker with the same no-silent-number guarantee)."""
    p = tmp_path / "junk.csv"
    p.write_text("g,c1,c2\ng1,1.5x,2.5\ng2,1.5 2.5,4.5\n")
    m = native.read_csv_matrix(p)
    assert np.isnan(m[0, 0]) and np.isnan(m[1, 0])
    np.testing.assert_array_equal(m[:, 1], [2.5, 4.5])


def test_inf_nan_literals_match_pandas(tmp_path):
    p = tmp_path / "lit.csv"
    p.write_text("g,c1,c2\ng1,inf,-inf\ng2,nan,2.5\n")
    got = native.read_csv_matrix(p)
    exp = _pandas_f32(p)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
    m = ~np.isnan(exp)
    np.testing.assert_array_equal(got[m], exp[m])


def test_fuzz_random_valid_csv_exact_vs_pandas(tmp_path):
    """Property fuzz: random shapes, random float formats (fixed/exp/int,
    up to 12 digits, huge/tiny magnitudes, random NA holes, CRLF or LF,
    random quoting) — native must agree with pandas to the BIT on every
    non-NaN cell, with identical NaN masks."""
    rng = np.random.default_rng(7)
    for trial in range(8):
        rows = int(rng.integers(1, 30))
        cols = int(rng.integers(1, 12))
        crlf = bool(rng.integers(0, 2))
        eol = "\r\n" if crlf else "\n"
        lines = ["g," + ",".join(f"c{i}" for i in range(cols))]
        for r in range(rows):
            fields = []
            for c in range(cols):
                kind = rng.integers(0, 6)
                if kind == 0:
                    s = ""  # missing
                elif kind == 1:
                    s = f"{rng.uniform(-1e3, 1e3):.{int(rng.integers(0, 12))}f}"
                elif kind == 2:
                    s = f"{rng.uniform(-1, 1) * 10.0 ** rng.integers(-40, 40):.{int(rng.integers(1, 10))}e}"
                elif kind == 3:
                    s = str(int(rng.integers(-10**12, 10**12)))
                elif kind == 4:
                    s = "NA"
                else:
                    s = f"{rng.uniform(0, 50):.5f}"
                if rng.integers(0, 5) == 0 and s:
                    s = f'"{s}"'  # random quoting
                fields.append(s)
            lines.append(f"gene_{r}," + ",".join(fields))
        p = tmp_path / f"fuzz_{trial}.csv"
        p.write_bytes((eol.join(lines) + eol).encode())
        got = native.read_csv_matrix(p)
        exp = _pandas_f32(p)
        assert got.shape == exp.shape == (rows, cols)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
        m = ~np.isnan(exp)
        np.testing.assert_array_equal(got[m], exp[m])
