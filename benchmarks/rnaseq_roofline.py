"""Roofline attribution for the realistic RNA-seq config (b256 h256).

Round-2 VERDICT weak #2: the realistic config sat at ~22% of the
measured device peak with no analysis of what bounds it. jax.profiler
traces through the axon relay are unreliable, so this attributes the
epoch time by ABLATION — timing progressively larger slices of the
training step as whole-epoch lax.scan programs (same shapes, same scan
structure, one host sync per measurement):

  fwd        loss only
  fwd+bwd    loss + gradients (no optimizer)
  full       loss + gradients + Riemannian Adam update (the real step)

and by an HBM traffic model: per step the wide (G,H)/(H,G) kernels are
read for fwd (2x), read for bwd-transpose (2x), their grads written
(2x), Adam moments read+written (4x), params written (2x) — about
12 * G*H * 4 bytes of weight-class traffic vs only 3 * B*G * 4 of
activation-class traffic at B=256, G=20480, H=256. If weight-class
traffic bounds the step, fwd+bwd -> full should show a large jump and
bf16 parameter storage (param_dtype='bfloat16', halves every
weight-class stream) should recover most of it.

Run on the real chip: python benchmarks/rnaseq_roofline.py
Writes benchmarks/RNASEQ_ROOFLINE.json.
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


def build_epoch_fns(model, x, batch, lr=1e-3):
    import jax
    import jax.numpy as jnp
    import optax

    from hyperbolic_vae_tpu.optim import riemannian_adam

    n = x.shape[0]
    steps = n // batch
    optimizer = riemannian_adam(lr, ball=model.ball)

    def loss_metrics(p, xb, key):
        return model.apply({"params": p}, xb, method="loss", rngs={"sample": key})

    def epoch(mode):
        def run(params, opt_state, xd, key):
            def step(carry, off):
                params, opt_state, skey = carry
                skey, sk = jax.random.split(skey)
                xb = jax.lax.dynamic_slice_in_dim(xd, off, batch, axis=0)
                if mode == "fwd":
                    m = loss_metrics(params, xb, sk)
                    return (params, opt_state, skey), m["loss_total"]
                loss, grads = jax.value_and_grad(
                    lambda p: loss_metrics(p, xb, sk)["loss_total"]
                )(params)
                if mode == "fwd_bwd":
                    # consume the grads without the optimizer: fold their
                    # global norm into the output so XLA can't DCE them
                    return (params, opt_state, skey), loss + 0.0 * optax.global_norm(grads)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, skey), loss

            offs = jax.random.randint(key, (steps,), 0, n - batch + 1)
            (params, opt_state, _), losses = jax.lax.scan(
                step, (params, opt_state, key), offs
            )
            return params, opt_state, jnp.mean(losses)

        return jax.jit(run, donate_argnums=(0, 1))

    return {m: epoch(m) for m in ("fwd", "fwd_bwd", "full")}, steps


def time_epoch(fn, params, opt_state, xd, iters=5):
    import jax

    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, k = jax.random.split(key)
        params, opt_state, loss = fn(params, opt_state, xd, k)
        float(loss)  # axon sync
    times = []
    for _ in range(iters):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, loss = fn(params, opt_state, xd, k)
        float(loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cells", type=int, default=8192)
    ap.add_argument("--n-genes", type=int, default=20480)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperbolic_vae_tpu.models import RNASeqVAE

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (args.n_cells, args.n_genes)).astype(np.float32)
    xd = jnp.asarray(x)
    steps = args.n_cells // args.batch
    G, H, B = args.n_genes, args.hidden, args.batch

    results = {
        "device": str(jax.devices()[0]),
        "config": f"b{B}_h{H}_g{G}", "steps_per_epoch": steps,
    }
    for pdt in ("float32", "bfloat16"):
        model = RNASeqVAE(in_features=G, hidden_dim=H, latent_dim=2,
                          param_dtype=pdt)
        fns, _ = build_epoch_fns(model, x, B)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            xd[:2],
        )
        arm = {}
        for mode, fn in fns.items():
            import optax

            from hyperbolic_vae_tpu.optim import riemannian_adam

            params = jax.tree.map(jnp.copy, variables["params"])
            opt_state = riemannian_adam(1e-3, ball=model.ball).init(params)
            dt = time_epoch(fn, params, opt_state, xd)
            arm[mode] = {
                "epoch_ms": round(dt * 1e3, 2),
                "step_us": round(dt / steps * 1e6, 1),
            }
        # traffic model (bytes/step of the weight-class streams)
        wbytes = 2 * G * H * (2 if pdt == "bfloat16" else 4)
        arm["weight_class_bytes_per_step"] = 6 * wbytes  # fwd+bwd reads, grad w, m/v rw, p w
        arm["activation_bytes_per_step"] = 3 * B * G * 4
        results[f"param_{pdt}"] = arm
        print(json.dumps({f"param_{pdt}": arm}), file=sys.stderr, flush=True)

    f32 = results["param_float32"]
    results["attribution_ms"] = {
        "fwd": f32["fwd"]["epoch_ms"],
        "bwd": round(f32["fwd_bwd"]["epoch_ms"] - f32["fwd"]["epoch_ms"], 2),
        "optimizer": round(f32["full"]["epoch_ms"] - f32["fwd_bwd"]["epoch_ms"], 2),
    }
    (REPO_ROOT / "benchmarks" / "RNASEQ_ROOFLINE.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
