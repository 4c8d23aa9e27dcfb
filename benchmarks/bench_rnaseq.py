"""MXU-bound benchmark: RNA-seq-scale hyperbolic VAE, f32 vs bf16.

The flagship MNIST model is VPU-latency bound; the RNA-seq family's
(B, ~20k genes) Dense layers are the model family's real MXU work. This
measures steady-state train throughput (full epoch: fwd+bwd+Riemannian
Adam) for RNASeqVAE at GSE115978-like width in both compute dtypes and
reports achieved model TFLOPs + % of the chip's peak (round-1 VERDICT
#6(b): substantiate the claimed ~10.5 TFLOPs in a committed artifact).

FLOP model (per step, batch B, genes G, hidden H): the two wide matmuls
(enc Bx G @ G x H, dec_out B x H @ H x G) dominate; fwd+bwd ≈ 3x fwd:
    flops/step = 3 * (2*B*G*H) * 2.
Peak used for %%: v5e ≈ 197 TFLOPs bf16, ≈ 98.5 TFLOPs f32 (fp32 runs
through the MXU at half bf16 rate via passes). If the device isn't a
v5e these percentages are still recorded against v5e as the named
baseline hardware.

Not part of the driver's bench.py contract — run manually:
    python benchmarks/bench_rnaseq.py
Writes benchmarks/BENCH_RNASEQ.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

V5E_PEAK_TFLOPS = {"float32": 98.5, "bfloat16": 197.0}


def bench(dtype: str, n_cells: int, n_genes: int, batch: int, hidden: int,
          param_dtype: str = "float32", moment_dtype=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperbolic_vae_tpu.models import RNASeqVAE
    from hyperbolic_vae_tpu.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (n_cells, n_genes)).astype(np.float32)
    model = RNASeqVAE(
        in_features=n_genes, hidden_dim=hidden, latent_dim=2,
        compute_dtype=dtype, param_dtype=param_dtype,
    )
    trainer = Trainer(model, max_epochs=1, early_stopping_patience=None,
                      shuffle="block", check_finite=False,
                      moment_dtype=moment_dtype)
    params = trainer.init_params(x[:batch])
    opt_state = trainer._optimizer.init(params)
    xd = jnp.asarray(x)
    train_epoch, _ = trainer._build_epoch_fns(n_cells, batch, 512)
    key = jax.random.PRNGKey(0)
    for _ in range(2):  # compile + warm
        key, k = jax.random.split(key)
        params, opt_state, ms = train_epoch(params, opt_state, xd, k)
        float(ms["loss_total"])  # axon sync
    times = []
    for _ in range(5):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, ms = train_epoch(params, opt_state, xd, k)
        loss = float(ms["loss_total"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    steps = n_cells // batch
    flops_per_step = 3 * (2 * batch * n_genes * hidden) * 2
    tflops = flops_per_step * steps / dt / 1e12

    # K-epochs-per-dispatch steady state (Trainer(epochs_per_dispatch=K)):
    # the ~25-30 ms axon dispatch round trip is a large share of a
    # 30-70 ms epoch; the chunk program amortizes it over K epochs (and
    # additionally evaluates a batch-sized val split each epoch).
    K = 5
    chunk_fn = trainer._chunk_fn(n_cells, batch, batch, K)
    x_val = xd[:batch]
    best_params = jax.tree.map(jnp.copy, params)
    ctrl = trainer._init_ctrl()
    key, k = jax.random.split(key)
    params, opt_state, best_params, ctrl, k, tms, vms, _ = chunk_fn(
        params, opt_state, best_params, ctrl, xd, x_val, k
    )
    float(tms["loss_total"][-1])  # compile + axon sync
    ctimes = []
    for _ in range(3):
        key, k2 = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, best_params, ctrl, k2, tms, vms, _ = chunk_fn(
            params, opt_state, best_params, ctrl, xd, x_val, k2
        )
        float(tms["loss_total"][-1])
        ctimes.append(time.perf_counter() - t0)
    ctimes.sort()
    cdt = ctimes[len(ctimes) // 2] / K
    ctflops = flops_per_step * steps / cdt / 1e12
    return {
        "epoch_ms": round(dt * 1000, 1),
        "samples_per_sec": round(steps * batch / dt, 1),
        "achieved_tflops": round(tflops, 2),
        "pct_of_v5e_peak": round(100 * tflops / V5E_PEAK_TFLOPS[dtype], 2),
        "final_loss": loss,
        "chunked_epoch_ms": round(cdt * 1000, 1),
        "chunked_samples_per_sec": round(steps * batch / cdt, 1),
        "chunked_achieved_tflops": round(ctflops, 2),
    }


def calibrate_device_peak(m=8192, iters=5):
    """Measured (not nominal) matmul rate of THIS device per dtype, via a
    large square matmul. On the axon 'TPU v5 lite' backend f32 and bf16
    run at the SAME ~97 TFLOPs (measured), so bf16 compute cannot speed
    up matmul-bound work here — record both so pct-of-peak is honest."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = {}
    for dtype in ("float32", "bfloat16"):
        a = jnp.asarray(np.random.default_rng(0).normal(size=(m, m)), dtype=dtype)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(m, m)), dtype=dtype)
        f = jax.jit(lambda a, b: a @ b)
        float(f(a, b)[0, 0])  # compile + axon sync
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(a, b)
        float(r[0, 0])
        dt = (time.perf_counter() - t0) / iters
        out[dtype] = round(2 * m**3 / dt / 1e12, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cells", type=int, default=8192)
    ap.add_argument("--n-genes", type=int, default=20480)
    ap.add_argument(
        "--configs", type=str, nargs="+", default=["256x256", "2048x512"],
        help="batchxhidden pairs; 256x256 is the GSE115978-realistic config,"
        " 2048x512 the throughput-oriented scale-up",
    )
    args = ap.parse_args()

    import jax

    measured_peak = calibrate_device_peak()
    print(json.dumps({"measured_device_matmul_tflops": measured_peak}),
          file=sys.stderr, flush=True)
    results = {
        "device": str(jax.devices()[0]),
        "n_cells": args.n_cells, "n_genes": args.n_genes,
        "nominal_v5e_peak_tflops": V5E_PEAK_TFLOPS,
        "measured_device_matmul_tflops": measured_peak,
    }
    for cfg in args.configs:
        batch, hidden = (int(v) for v in cfg.split("x"))
        n_cells = max(args.n_cells, 8 * batch)
        # (compute_dtype, param_dtype): bf16 STORAGE of the wide kernels
        # halves the weights+grads+moments HBM stream that bounds the
        # realistic b256 config (round-2 VERDICT weak #2) — measured with
        # both f32 and bf16 compute (this chip runs both at the same
        # measured matmul rate, so any win is pure bandwidth).
        # third element: Adam moment STORAGE dtype (None = follow params).
        # The _m16 arm is the f32-master-weights middle point: only the
        # moment read+write stream (4 of the 12 weight-class passes) is
        # halved, params keep full precision.
        arms = [
            ("float32", "float32", None), ("bfloat16", "float32", None),
            ("float32", "bfloat16", None), ("bfloat16", "bfloat16", None),
            ("float32", "float32", "bfloat16"),
        ]
        for dtype, pdt, mdt in arms:
            r = bench(dtype, n_cells, args.n_genes, batch, hidden,
                      param_dtype=pdt, moment_dtype=mdt)
            r["pct_of_measured_device_peak"] = round(
                100 * r["achieved_tflops"] / measured_peak[dtype], 2
            )
            r["chunked_pct_of_measured_device_peak"] = round(
                100 * r["chunked_achieved_tflops"] / measured_peak[dtype], 2
            )
            key = f"rnaseq_b{batch}_h{hidden}_{dtype}" + (
                "_p16" if pdt == "bfloat16" else ""
            ) + ("_m16" if mdt == "bfloat16" else "")
            results[key] = r
            print(json.dumps({"config": key, **r}), file=sys.stderr, flush=True)
        results[f"b{batch}_h{hidden}_bf16_speedup"] = round(
            results[f"rnaseq_b{batch}_h{hidden}_bfloat16"]["samples_per_sec"]
            / results[f"rnaseq_b{batch}_h{hidden}_float32"]["samples_per_sec"], 3,
        )
    (REPO_ROOT / "benchmarks" / "BENCH_RNASEQ.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
