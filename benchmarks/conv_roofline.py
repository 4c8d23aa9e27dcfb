"""Roofline attribution for the hyperbolic conv image VAE.

Round-3 VERDICT weak #1: BENCH_CONV has `hyperbolic_image_vae` at
5.2–5.6% of measured matmul peak while BASELINE.md *argues* a 12–25%
architecture ceiling (16/32 channels vs the 128-lane MXU,
/root/reference/hyperbolic_vae/models/vae_hyperbolic.py:60-66) and
attributes the rest to "f32 VPU manifold math" by hand. This script
replaces the hand-waving with measured arms, in the mold of
rnaseq_roofline.py (whole-epoch lax.scan programs, one host sync per
measurement, b256 f32 — the BENCH_CONV reporting config):

  ablation ladder (all FULL train steps — loss + grads + Riemannian
  Adam — unless marked fwd):
    full            the real step (dec_first=geoopt_gyroplane, Pallas)
    full_jnp_gyro   same, Pallas gyroplane disabled (jnp epilogue path)
    full_lin_dec    dec_first=linear (gyroplane layer removed entirely)
    no_kl           KL chain off: recon-only loss (keeps rsample)
    no_sample       + sampling chain off: decode(mu) directly
    fwd             forward loss only (no grads, no optimizer)

  width control (the MXU lane-occupancy ceiling story, measured):
    base_channels in {16, 64, 128} at the full step — if the 16/32-wide
    channel contractions are what caps the 5–6%, achieved TFLOPs as a
    fraction of peak must RISE with width (the analytic conv FLOPs grow
    ~m^2 while the manifold/VPU chain is width-independent).

Run on the real chip: python benchmarks/conv_roofline.py
Writes benchmarks/CONV_ROOFLINE.json.
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

from benchmarks.bench_conv import (
    flops_per_sample_fwd,
    hyperbolic_image_vae_layers,
)


def build_epoch_fn(model, n, batch, mode, lr=1e-3):
    """Whole-epoch scan of the (possibly ablated) train step."""
    import jax
    import jax.numpy as jnp
    import optax

    from hyperbolic_vae_tpu.distributions import (
        wrapped_normal_log_prob,
        wrapped_normal_rsample,
    )
    from hyperbolic_vae_tpu.optim import riemannian_adam

    steps = n // batch
    ball = model.ball
    optimizer = riemannian_adam(lr, ball=ball)

    def arm_loss(p, xb, key):
        mu, scale = model.apply({"params": p}, xb, method="encode")
        if mode == "no_sample":
            z = mu
        else:
            z = wrapped_normal_rsample(key, ball, mu, scale)
        x_hat = model.apply({"params": p}, z, method="decode")
        recon = jnp.sum((x_hat - xb) ** 2)
        if mode in ("no_kl", "no_sample"):
            return recon
        log_q = wrapped_normal_log_prob(ball, mu, scale, z)
        origin = jnp.zeros((model.latent_dim,), jnp.float32)
        log_p = wrapped_normal_log_prob(
            ball, origin, jnp.ones((model.latent_dim,)), z
        )
        return recon + jnp.sum(log_q - log_p)

    def run(params, opt_state, xd, key):
        def step(carry, off):
            params, opt_state, skey = carry
            skey, sk = jax.random.split(skey)
            xb = jax.lax.dynamic_slice_in_dim(xd, off, batch, axis=0)
            if mode == "fwd":
                return (params, opt_state, skey), arm_loss(params, xb, sk)
            loss, grads = jax.value_and_grad(arm_loss)(params, xb, sk)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, skey), loss

        offs = jax.random.randint(key, (steps,), 0, n - batch + 1)
        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, key), offs
        )
        return params, opt_state, jnp.mean(losses)

    return jax.jit(run, donate_argnums=(0, 1)), steps


def time_epoch(fn, make_state, xd, iters=5):
    """Median synchronized wall time of the donated whole-epoch program
    (state threading in the closure; loop semantics in _timing)."""
    import jax

    from benchmarks._timing import timed_reps

    state = {"po": make_state(), "key": jax.random.PRNGKey(0), "loss": None}

    def step():
        state["key"], k = jax.random.split(state["key"])
        params, opt_state, loss = fn(*state["po"], xd, k)
        float(loss)  # axon sync (block_until_ready returns at enqueue)
        state["po"], state["loss"] = (params, opt_state), loss

    ts = timed_reps(step, warmup=2, reps=iters)
    return ts[len(ts) // 2], float(state["loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--widths", type=int, nargs="+", default=[16, 64, 128])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.bench_rnaseq import calibrate_device_peak
    from hyperbolic_vae_tpu.models import HyperbolicImageVAE
    from hyperbolic_vae_tpu.optim import riemannian_adam
    import hyperbolic_vae_tpu.ops.gyroplane as gyro

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, (args.n, 32, 32, 3)).astype(np.float32)
    xd = jnp.asarray(x)
    B, n = args.batch, args.n
    shape = (32, 32, 3)

    peak = calibrate_device_peak()
    results = {
        "device": str(jax.devices()[0]), "n": n, "batch": B,
        "measured_device_matmul_tflops": peak,
    }

    def make_model(dec="geoopt_gyroplane", m=16):
        return HyperbolicImageVAE(
            data_shape=shape, latent_dim=2,
            decoder_first_layer_module=dec, base_channels=m,
        )

    def state_for(model):
        def make():
            v = model.init(
                {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                xd[:2],
            )
            params = v["params"]
            return params, riemannian_adam(1e-3, ball=model.ball).init(params)
        return make

    # ---- ablation ladder at the reference width ----
    ladder = {}
    gyro_model = make_model()
    for mode in ("full", "no_kl", "no_sample", "fwd"):
        fn, steps = build_epoch_fn(gyro_model, n, B, mode)
        dt, loss = time_epoch(fn, state_for(gyro_model), xd)
        ladder[mode] = {
            "epoch_ms": round(dt * 1e3, 2),
            "samples_per_sec": round(steps * B / dt, 1),
        }
        print(json.dumps({mode: ladder[mode]}), file=sys.stderr, flush=True)

    # Pallas gyroplane off (jnp epilogue path): raise the dispatch
    # threshold so gyroplane_distances_fast never lowers to the kernel
    orig_min_work = gyro._PALLAS_MIN_WORK
    try:
        gyro._PALLAS_MIN_WORK = 1 << 60
        fn, steps = build_epoch_fn(gyro_model, n, B, "full")
        dt, _ = time_epoch(fn, state_for(gyro_model), xd)
    finally:
        gyro._PALLAS_MIN_WORK = orig_min_work
    ladder["full_jnp_gyro"] = {
        "epoch_ms": round(dt * 1e3, 2),
        "samples_per_sec": round(steps * B / dt, 1),
    }
    print(json.dumps({"full_jnp_gyro": ladder["full_jnp_gyro"]}),
          file=sys.stderr, flush=True)

    lin_model = make_model(dec="linear")
    fn, steps = build_epoch_fn(lin_model, n, B, "full")
    dt, _ = time_epoch(fn, state_for(lin_model), xd)
    ladder["full_lin_dec"] = {
        "epoch_ms": round(dt * 1e3, 2),
        "samples_per_sec": round(steps * B / dt, 1),
    }
    print(json.dumps({"full_lin_dec": ladder["full_lin_dec"]}),
          file=sys.stderr, flush=True)
    results["ablation_b256_f32"] = ladder
    results["attribution_ms"] = {
        "kl_chain": round(ladder["full"]["epoch_ms"] - ladder["no_kl"]["epoch_ms"], 2),
        "sampling_chain": round(
            ladder["no_kl"]["epoch_ms"] - ladder["no_sample"]["epoch_ms"], 2
        ),
        "bwd_plus_optimizer": round(
            ladder["full"]["epoch_ms"] - ladder["fwd"]["epoch_ms"], 2
        ),
        "gyroplane_pallas_vs_jnp": round(
            ladder["full_jnp_gyro"]["epoch_ms"] - ladder["full"]["epoch_ms"], 2
        ),
        "gyroplane_vs_linear_dec": round(
            ladder["full"]["epoch_ms"] - ladder["full_lin_dec"]["epoch_ms"], 2
        ),
    }

    # ---- width control: does % of peak rise with channel width? ----
    widths = {}
    for m in args.widths:
        model = make_model(m=m)
        fwd_flops = flops_per_sample_fwd(hyperbolic_image_vae_layers(shape, m))
        fn, steps = build_epoch_fn(model, n, B, "full")
        dt, _ = time_epoch(fn, state_for(model), xd)
        train_tflops = 3 * fwd_flops * steps * B / dt / 1e12
        widths[f"m{m}"] = {
            "epoch_ms": round(dt * 1e3, 2),
            "samples_per_sec": round(steps * B / dt, 1),
            "conv_flops_per_sample_fwd": fwd_flops,
            "achieved_tflops": round(train_tflops, 3),
            "pct_of_measured_device_peak": round(
                100 * train_tflops / peak["float32"], 2
            ),
        }
        print(json.dumps({f"m{m}": widths[f"m{m}"]}), file=sys.stderr, flush=True)
    results["width_control_full_step"] = widths

    (REPO_ROOT / "benchmarks" / "CONV_ROOFLINE.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
