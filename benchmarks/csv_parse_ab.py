"""A/B the native CSV parser's scan strategies on a quote-free numeric
matrix (the production RNA-seq shape — the reference's GSE115978 TPM CSV
has no quoted fields in its numeric body).

Round-5 session-3 review finding: the RFC-4180 hardening (commit
eabc24d) replaced the SIMD memchr comma scan with a per-byte quote-aware
walk on EVERY field, trading multi-GB scan throughput for correctness
the common case doesn't need. The fix probes each row for '"' once
(one vectorized memchr) and keeps the memchr comma scan for quote-free
rows. This benchmark builds all three variants from git history and
times them on the same synthetic TPM-like file:

  pre_hardening : round-4 memchr-only scan (quote-BLIND — silently
                  shifts columns on quoted fields; kept as the speed
                  ceiling reference)
  quote_walk    : round-5 session-1 quote-aware walk everywhere
  fast_path     : current — per-row quote probe + memchr fast path

Writes benchmarks/CSV_PARSE_AB.json. Run when the machine is otherwise
idle (wall-clock timing).
"""

import ctypes
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

# git revs holding each variant of native/csv_etl.cpp
VARIANTS = {
    "pre_hardening": "eabc24d^",  # before "Harden native CSV parser"
    "quote_walk": "eabc24d",      # quote-aware walk on every field
    "fast_path": "WORKTREE",      # current tree (per-row probe + memchr)
}


def build_variant(name: str, rev: str, workdir: Path) -> Path:
    src = workdir / f"{name}.cpp"
    if rev == "WORKTREE":
        src.write_bytes((REPO / "native/csv_etl.cpp").read_bytes())
    else:
        blob = subprocess.run(
            ["git", "-C", str(REPO), "show", f"{rev}:native/csv_etl.cpp"],
            capture_output=True, check=True,
        ).stdout
        src.write_bytes(blob)
    so = workdir / f"lib{name}.so"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-Wall",
         "-pthread", "-shared", "-o", str(so), str(src)],
        check=True,
    )
    return so


def bind(so_path: Path):
    lib = ctypes.CDLL(str(so_path))
    lib.hvae_csv_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.hvae_csv_read_f32.restype = ctypes.c_int
    return lib


def make_csv(path: Path, rows: int, cols: int) -> None:
    rng = np.random.default_rng(0)
    m = rng.gamma(0.3, 40.0, size=(rows, cols)).astype(np.float32)
    m[rng.random((rows, cols)) < 0.6] = 0.0  # sparse like TPM matrices
    with open(path, "w") as f:
        f.write("gene," + ",".join(f"c{j}" for j in range(cols)) + "\n")
        for i in range(rows):
            f.write(f"g{i}," + ",".join(
                "0" if v == 0 else f"{v:.4f}" for v in m[i]) + "\n")


def time_variant(lib, path: Path, rows: int, cols: int, reps: int = 3):
    out = np.empty((rows, cols), np.float32)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        rc = lib.hvae_csv_read_f32(
            str(path).encode(), 1, 1,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows, cols, 0,
        )
        dt = time.perf_counter() - t0
        assert rc == 0, rc
        best = min(best, dt)
    return best, out.copy()


def main():
    rows, cols = 2048, 8192
    with tempfile.TemporaryDirectory() as td:
        work = Path(td)
        csv = work / "tpm.csv"
        print(f"generating {rows}x{cols} CSV ...", flush=True)
        make_csv(csv, rows, cols)
        size_mb = csv.stat().st_size / 1e6

        results = {}
        ref_out = None
        for name, rev in VARIANTS.items():
            so = build_variant(name, rev, work)
            lib = bind(so)
            dt, out = time_variant(lib, csv, rows, cols)
            if ref_out is None:
                ref_out = out
            else:
                np.testing.assert_array_equal(out, ref_out)
            results[name] = {
                "seconds": round(dt, 4),
                "gb_per_s": round(size_mb / 1e3 / dt, 3),
            }
            print(f"{name:14s} {dt:.3f}s  {size_mb / 1e3 / dt:.2f} GB/s",
                  flush=True)

        # pandas arm for scale (the reader the reference leans on)
        import pandas as pd

        t0 = time.perf_counter()
        pd.read_csv(csv, index_col=0).to_numpy(dtype=np.float32)
        dt_pd = time.perf_counter() - t0
        results["pandas"] = {
            "seconds": round(dt_pd, 4),
            "gb_per_s": round(size_mb / 1e3 / dt_pd, 3),
        }
        print(f"{'pandas':14s} {dt_pd:.3f}s", flush=True)

        import os

        payload = {
            "file": f"{rows}x{cols} quote-free synthetic TPM CSV "
                    f"({size_mb:.0f} MB)",
            "note": "per-row quote probe + memchr fast path vs the "
                    "quote-aware walk (round-5 session-3 fix); "
                    "pre_hardening is the quote-blind speed ceiling. "
                    "Measured conclusion: on this host the scan is "
                    "FLOAT-PARSE-bound (short sparse fields), so the "
                    "quote-walk regression is bounded at ~5% and the "
                    "fast path recovers ~a third of it — the fix is "
                    "kept as zero-cost insurance for scan-bound hosts/"
                    "files (long fields, wide SIMD), not claimed as a "
                    "multi-fold win",
            "cpus": os.cpu_count(),
            "threads": "hardware_concurrency",
            "results": results,
            # both ratios oriented the same way: seconds(X)/seconds(Y),
            # so >1.0 always reads "X is slower than Y"
            "quote_walk_over_fast_path": round(
                results["quote_walk"]["seconds"]
                / results["fast_path"]["seconds"], 3),
            "fast_path_over_pre_hardening": round(
                results["fast_path"]["seconds"]
                / results["pre_hardening"]["seconds"], 3),
            "pandas_over_fast_path": round(
                results["pandas"]["seconds"]
                / results["fast_path"]["seconds"], 2),
        }
        out_path = REPO / "benchmarks/CSV_PARSE_AB.json"
        out_path.write_text(json.dumps(payload, indent=2) + "\n")
        print(f"wrote {out_path}")


if __name__ == "__main__":
    sys.exit(main())
