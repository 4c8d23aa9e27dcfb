"""MXU-bound benchmark: conv VAE families at CIFAR shape, f32 vs bf16.

Round-1 VERDICT #6(a): the flagship MLP bench is VPU-latency bound; the
conv families (EuclideanVAE, HyperbolicImageVAE) are where convs hit the
MXU, and ``compute_dtype="bfloat16"`` existed with no measured speedup.
This measures steady-state train throughput (full epoch: fwd+bwd+
optimizer, whole-epoch-jit Trainer program) for each (model, dtype) and
writes benchmarks/BENCH_CONV.json.

Run on the real chip: python benchmarks/bench_conv.py
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


def bench_model(model, x, batch, n_val=512, warmup=2, iters=5):
    import jax
    import jax.numpy as jnp

    from hyperbolic_vae_tpu.train import Trainer

    trainer = Trainer(model, max_epochs=1, early_stopping_patience=None,
                      shuffle="block", check_finite=False)
    params = trainer.init_params(x[:batch])
    opt_state = trainer._optimizer.init(params)
    xd = jnp.asarray(x)
    train_epoch, _ = trainer._build_epoch_fns(len(x), batch, n_val)
    key = jax.random.PRNGKey(0)
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

    # K-epochs-per-dispatch steady state (Trainer(epochs_per_dispatch=K)):
    # amortizes the ~25-30 ms axon dispatch round trip that dominates a
    # 45-50 ms epoch at this size (adds a batch-sized val eval per epoch).
    K = 5
    chunk_fn = trainer._chunk_fn(len(x), batch, batch, K)
    x_val = xd[:batch]
    best_params = jax.tree.map(jnp.copy, params)
    best_val = jnp.asarray(jnp.inf, jnp.float32)
    key, k = jax.random.split(key)
    params, opt_state, best_params, best_val, k, tms, vms = chunk_fn(
        params, opt_state, best_params, best_val, xd, x_val, k
    )
    float(tms["loss_total"][-1])  # compile + axon sync
    ctimes = []
    for _ in range(3):
        key, k2 = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, best_params, best_val, k2, tms, vms = chunk_fn(
            params, opt_state, best_params, best_val, xd, x_val, k2
        )
        float(tms["loss_total"][-1])
        ctimes.append(time.perf_counter() - t0)
    ctimes.sort()
    cdt = ctimes[len(ctimes) // 2] / K
    return {
        "epoch_ms": round(dt * 1000, 2),
        "samples_per_sec": round(steps * batch / dt, 1),
        "final_loss": loss,
        "chunked_epoch_ms": round(cdt * 1000, 2),
        "chunked_samples_per_sec": round(steps * batch / cdt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=64)
    args = ap.parse_args()

    import jax
    import numpy as np

    from hyperbolic_vae_tpu.models import EuclideanVAE, HyperbolicImageVAE

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, (args.n, 32, 32, 3)).astype(np.float32)

    results = {"device": str(jax.devices()[0]), "n": args.n, "batch": args.batch}
    configs = []
    for dt in ("float32", "bfloat16"):
        configs.append((f"euclidean_vae_{dt}", EuclideanVAE(
            data_shape=(32, 32, 3), hidden_size=args.hidden, latent_dim=2,
            compute_dtype=dt)))
        configs.append((f"hyperbolic_image_vae_{dt}", HyperbolicImageVAE(
            data_shape=(32, 32, 3), latent_dim=2,
            decoder_first_layer_module="geoopt_gyroplane", compute_dtype=dt)))
    for name, model in configs:
        r = bench_model(model, x, args.batch)
        results[name] = r
        print(json.dumps({"config": name, **r}), file=sys.stderr, flush=True)
    for fam in ("euclidean_vae", "hyperbolic_image_vae"):
        f32 = results[f"{fam}_float32"]["samples_per_sec"]
        bf16 = results[f"{fam}_bfloat16"]["samples_per_sec"]
        results[f"{fam}_bf16_speedup"] = round(bf16 / f32, 3)
    (REPO_ROOT / "benchmarks" / "BENCH_CONV.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
