"""ctypes binding for the native ETL kernel (native/csv_etl.cpp).

Graceful: if the shared library hasn't been built (`make -C native`),
``is_available()`` is False and callers fall back to pandas.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "native" / "libhvae_native.so"
_lib: Optional[ctypes.CDLL] = None


def _try_build() -> None:
    """Best-effort `make -C native` on first use (the .so is not
    committed; the toolchain is baked into the image). Serialized by an
    flock so parallel first users (e.g. pytest -n workers on a fresh
    clone) don't race concurrent compiles onto the same .so."""
    import subprocess

    try:
        import fcntl

        with open(_LIB_PATH.parent / ".build.lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            if _LIB_PATH.exists():  # another process just built it
                return
            subprocess.run(
                ["make", "-C", str(_LIB_PATH.parent)],
                capture_output=True, timeout=120, check=False,
            )
    except Exception:  # no make / sandboxed: stay on the pandas fallback
        logger.info("native build unavailable; using pandas fallback")


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _try_build()
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.hvae_csv_shape.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hvae_csv_shape.restype = ctypes.c_int
    lib.hvae_csv_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
    ]
    lib.hvae_csv_read_f32.restype = ctypes.c_int
    lib.hvae_zscore_columns.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.hvae_zscore_columns.restype = ctypes.c_int
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


# error codes from native/csv_etl.cpp — a malformed file must fail LOUDLY
# (a silent mis-parse would poison every downstream RNA-seq result)
_READ_ERRORS = {
    1: "cannot read file",
    2: "fewer lines than expected (rows + header)",
    3: "ragged row: a row has fewer index columns than skip_cols",
    4: "ragged row: a row has FEWER value fields than the first data row",
    5: "ragged row: a row has MORE fields than the first data row "
       "(trailing delimiter or unquoted comma?)",
    6: "unterminated quote in a row (embedded newline in a quoted "
       "field? use the pandas reader for such files)",
}


def read_csv_matrix(
    path, skip_header: int = 1, skip_cols: int = 1, n_threads: int = 0
) -> np.ndarray:
    """Parse a numeric CSV into a float32 (rows, cols) array, skipping the
    header line and leading index column(s) — the TPM CSV layout.

    Malformed-input contract (tests/test_native.py adversarial suite):
    RFC-4180 quoted fields with embedded commas/quotes and CRLF line
    endings parse identically to pandas; unparseable VALUES ("NA", "",
    junk) become NaN; structurally ragged ROWS raise RuntimeError.
    Known limit: a quoted field containing an embedded NEWLINE (legal
    RFC-4180, accepted by pandas) is rejected loudly — the physical-line
    scanner splits such rows, so every row with an odd quote count
    (unterminated quote) raises RuntimeError (code 6) rather than risk a
    silent mis-parse when the fragments' field counts happen to line up;
    route such files through the pandas fallback."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run `make -C native`")
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.hvae_csv_shape(str(path).encode(), skip_header, skip_cols,
                            ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        detail = _READ_ERRORS.get(rc, "unknown error")
        raise RuntimeError(f"hvae_csv_shape failed for {path}: {detail} (code {rc})")
    out = np.empty((rows.value, cols.value), dtype=np.float32)
    rc = lib.hvae_csv_read_f32(
        str(path).encode(), skip_header, skip_cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows.value, cols.value, n_threads,
    )
    if rc != 0:
        detail = _READ_ERRORS.get(rc, "unknown error")
        raise RuntimeError(f"hvae_csv_read_f32 failed for {path}: {detail} (code {rc})")
    return out


def zscore_columns(x: np.ndarray, ddof: int = 1, n_threads: int = 0) -> np.ndarray:
    """In-place parallel column z-score; returns x."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run `make -C native`")
    assert x.dtype == np.float32 and x.flags.c_contiguous
    rc = lib.hvae_zscore_columns(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[0], x.shape[1], ddof, n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"hvae_zscore_columns failed with code {rc}")
    return x
