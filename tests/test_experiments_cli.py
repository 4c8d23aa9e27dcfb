"""Smoke tests for the experiment entry points: each CLI runs end-to-end
with tiny synthetic settings on CPU (catches arg wiring, not quality)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (fast tier)

REPO = Path(__file__).resolve().parent.parent
EXP = REPO / "experiments"


def run_script(name, *extra, timeout=420):
    env = dict(os.environ)
    env["HVAE_FORCE_CPU"] = "1"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    cmd = [sys.executable, str(EXP / name), "--epochs", "2", "--batch-size", "32",
           "--no-early-stopping", *extra]
    proc = subprocess.run(
        cmd, cwd=EXP, env=env, capture_output=True, text=True, timeout=timeout
    )
    assert proc.returncode == 0, f"{name} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    return proc.stdout


def test_flagship_gyroplane_cli(tmp_path):
    out = run_script(
        "train_vae_hyperbolic_mnist_gyroplane.py",
        "--synthetic", "--n-train", "320", "--run-dir", str(tmp_path),
    )
    assert "test:" in out and "loss_total" in out


def test_flagship_gyroplane_seed_sweep_cli(tmp_path):
    out = run_script(
        "train_vae_hyperbolic_mnist_gyroplane.py",
        "--synthetic", "--n-train", "320", "--run-dir", str(tmp_path),
        "--seeds", "0", "1", "--epochs-per-dispatch", "2",
    )
    assert "seed=0" in out and "seed=1" in out and "ensemble" in out


def test_euclidean_mnist_cli(tmp_path):
    out = run_script(
        "train_vae_euclidean_mnist.py",
        "--synthetic", "--n-train", "160", "--run-dir", str(tmp_path),
    )
    assert "test:" in out


def test_rnaseq_cli(tmp_path):
    out = run_script(
        "train_vaes_rnaseq.py",
        "--fake", "--run-dir", str(tmp_path),
    )
    assert "test:" in out


def test_rnaseq_streamed_cli(tmp_path):
    # host-resident data path: 2 double-buffered blocks of 64 rows
    out = run_script(
        "train_vaes_rnaseq.py",
        "--fake", "--run-dir", str(tmp_path), "--stream-block-rows", "64",
    )
    assert "test:" in out


def test_pvae_replicate_cli(tmp_path):
    out = run_script(
        "pvae_replicate.py",
        "--synthetic", "--n-train", "256", "--posteriors", "wrapped",
        "--iwae-k", "50", "--run-dir", str(tmp_path),
    )
    assert "iwae_50" in out


def test_pvae_replicate_cli_lane_sweep(tmp_path):
    """Each (posterior, latent_dim) group's curvature cells as vmapped
    lanes of one program, IWAE eval vmapped over lanes too."""
    import json

    out = run_script(
        "pvae_replicate.py",
        "--synthetic", "--n-train", "256", "--posteriors", "wrapped",
        "--curvatures", "0.5", "1.4", "--iwae-k", "20",
        "--lane-sweep", "--run-dir", str(tmp_path),
    )
    assert "wrapped_c0.5_d2" in out and "wrapped_c1.4_d2" in out
    results = json.loads((tmp_path / "replicate_results.json").read_text())
    assert set(results) == {"wrapped_c0.5_d2", "wrapped_c1.4_d2"}
    assert all(
        v is not None and v == v
        for r in results.values() for v in r.values()
    ), results


def test_ae_cifar10_cli(tmp_path):
    out = run_script(
        "train_ae_euclidean_cifar10.py",
        "--synthetic", "--n-train", "128", "--latent-dims", "16",
        "--run-dir", str(tmp_path),
    )
    assert "latent_dim" in out


def test_vae_cifar10_cli(tmp_path):
    out = run_script(
        "train_vae_euclidean_cifar10.py",
        "--synthetic", "--n-train", "128", "--latent-dim", "8",
        "--run-dir", str(tmp_path),
    )
    assert "test:" in out


def test_hyperbolic_conv_cli(tmp_path):
    out = run_script(
        "train_vae_hyperbolic_mnist.py",
        "--synthetic", "--n-train", "128", "--run-dir", str(tmp_path),
    )
    assert "test:" in out


def test_export_serving_bundle_cli(tmp_path):
    """checkpoint -> export_serving_bundle.py -> ExportedInferencer.load:
    the full deployment path through the CLIs."""
    run_script(
        "train_vae_hyperbolic_mnist_gyroplane.py",
        "--synthetic", "--n-train", "320", "--run-dir", str(tmp_path / "run"),
    )
    env = dict(os.environ)
    env["HVAE_FORCE_CPU"] = "1"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    proc = subprocess.run(
        [sys.executable, str(EXP / "export_serving_bundle.py"),
         "--ckpt", str(tmp_path / "run" / "ckpt"), "--out", str(tmp_path / "bundle"),
         "--batch-size", "16", "--max-batches-per-dispatch", "2"],
        cwd=EXP, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # 3 methods x (row buckets {1,2,4,8} + dispatch buckets {1,2}) —
    # sub-batch row buckets are on by default (serve.py Inferencer)
    assert "exported 18 programs" in proc.stdout
    import jax
    import numpy as np

    from hyperbolic_vae_tpu.serve import ExportedInferencer

    inf = ExportedInferencer.load(tmp_path / "bundle")
    mu = inf.embed(np.zeros((5, 28, 28, 1), np.float32))
    assert mu.shape == (5, 2) and np.all(np.isfinite(mu))


def test_eval_checkpoints_cli_model_agnostic(tmp_path):
    """One eval command restores checkpoints from DIFFERENT model families
    via the embedded hparams (reference scripts/_5:51-52 pattern)."""
    run_script(
        "train_vae_hyperbolic_mnist_gyroplane.py",
        "--synthetic", "--n-train", "320", "--run-dir", str(tmp_path / "gyro"),
    )
    run_script(
        "train_vaes_rnaseq.py", "--fake", "--run-dir", str(tmp_path / "rna"),
    )
    out = run_script(
        "eval_checkpoints.py",
        "--synthetic", "--n-train", "320",
        "--glob", str(tmp_path / "*" / "ckpt"),
    )
    assert "GyroplaneVAE" in out and "UnifiedVAE" in out
    assert out.count("test/loss_total") >= 2


def test_eval_checkpoints_routes_conv_mnist(tmp_path):
    """(32, 32, 1) conv-MNIST checkpoints must restore against pad-to-32
    MNIST, not 3-channel CIFAR (the (32, 32)-prefix routing crashed with
    a ScopeParamShapeError — round-4 session-5 fix)."""
    run_script(
        "train_vae_hyperbolic_mnist.py",
        "--synthetic", "--n-train", "160", "--run-dir", str(tmp_path / "conv"),
    )
    out = run_script(
        "eval_checkpoints.py",
        "--synthetic", "--n-train", "160",
        "--glob", str(tmp_path / "*" / "ckpt"),
    )
    assert "HyperbolicImageVAE" in out and "test/loss_total" in out


def test_grid_cli_sequential(tmp_path):
    out = run_script(
        "train_vae_hyperbolic_mnist_grid.py",
        "--synthetic", "--n-train", "128",
        "--curvatures", "1.0", "--betas", "1.0",
        "--encoder-lasts", "linear", "--decoder-firsts", "geodesic",
        "--run-dir", str(tmp_path),
    )
    assert "c1.0_b1.0_d2_linear_geodesic" in out
    assert (tmp_path / "grid_results.json").exists()


def test_grid_cli_lane_sweep(tmp_path):
    """(curvature x beta) cells as vmapped lanes of ONE program."""
    out = run_script(
        "train_vae_hyperbolic_mnist_grid.py",
        "--synthetic", "--n-train", "128",
        "--lane-sweep",
        "--curvatures", "0.5", "1.4", "--betas", "1.0",
        "--encoder-lasts", "linear", "--decoder-firsts", "geodesic",
        "--run-dir", str(tmp_path),
    )
    assert "2 lanes in ONE program" in out
    assert "c0.5_b1.0_d2_linear_geodesic" in out
    assert "c1.4_b1.0_d2_linear_geodesic" in out
    import json

    results = json.loads((tmp_path / "grid_results.json").read_text())
    assert all(v is not None for v in results.values()), results


def test_probe_geometry_compare_cli(tmp_path):
    out = run_script(
        "probe_geometry_compare.py",
        "--n-samples", "200", "--n-genes", "64", "--probe-k", "3",
        "--run-dir", str(tmp_path),
    )
    assert "hyperbolic" in out and "euclidean" in out
    assert (tmp_path / "probe_compare.json").exists()


def test_pvae_replicate_real_mnist_comparison(tmp_path):
    """--real-mnist <idx-dir> trains on the IDX files and emits
    published_comparison.json — the side-by-side against Mathieu et
    al. 2019's MNIST table (VERDICT r4 #7). Exercised here on the
    fabricated-real-FORMAT path (synthetic pixels written as real IDX
    files); the same command against a real MNIST download is the
    real-data acceptance run (README 'With real data')."""
    import gzip
    import json
    import struct

    import numpy as np

    def write_idx(path, arr, gz=False):
        payload = struct.pack(">HBB", 0, 0x08, arr.ndim)
        payload += struct.pack(">" + "I" * arr.ndim, *arr.shape)
        payload += arr.astype(np.uint8).tobytes()
        opener = gzip.open if gz else open
        with opener(path, "wb") as f:
            f.write(payload)

    rng = np.random.default_rng(0)
    d = tmp_path / "mnist"
    d.mkdir()
    write_idx(d / "train-images-idx3-ubyte", rng.integers(0, 256, (640, 28, 28)))
    write_idx(d / "train-labels-idx1-ubyte", rng.integers(0, 10, (640,)))
    write_idx(d / "t10k-images-idx3-ubyte.gz", rng.integers(0, 256, (128, 28, 28)), gz=True)
    write_idx(d / "t10k-labels-idx1-ubyte.gz", rng.integers(0, 10, (128,)), gz=True)

    out = run_script(
        "pvae_replicate.py",
        "--real-mnist", str(d), "--posteriors", "wrapped",
        "--curvatures", "1.4", "--iwae-k", "20",
        "--run-dir", str(tmp_path / "run"),
    )
    assert "wrapped_c1.4_d2" in out
    cmp = json.loads((tmp_path / "run" / "published_comparison.json").read_text())
    assert "warning" not in cmp  # real-format path: no synthetic flag
    (row,) = cmp["rows"]
    assert row["latent_dim"] == 2
    assert row["published_pvae_nll"] == 142.5
    assert np.isfinite(row["measured_nll_iwae"])
    assert row["delta_vs_published_pvae"] == row["measured_nll_iwae"] - 142.5
