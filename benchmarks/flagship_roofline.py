"""Roofline attribution for the FLAGSHIP GyroplaneVAE — the headline
bench.py model (batch 256, 784-64-16-2 MLP, Poincare 2-D latent).

BENCH_r04 reports device_ms_per_epoch ~13.8 at 60k samples — about
4.3M samples/s of pure device time. This script pins WHERE that device
time goes and what the speed-of-light for the reference architecture
is, in the mold of conv_roofline.py / rnaseq_roofline.py.

Timing methodology (trap 6: standalone epochs are dispatch-dominated —
the ~30 ms axon round trip buries a ~14 ms epoch): every arm is timed
as a K-epochs-per-dispatch lax.scan chunk at TWO values of K, and the
reported number is the SLOPE (t_K2 - t_K1) / (K2 - K1) — pure device
ms/epoch with the dispatch overhead differenced out, exactly how
bench.py separates device_ms_per_epoch from dispatch_overhead_ms.

  ablation ladder (all FULL train steps — loss + grads + Riemannian
  Adam — unless marked):
    full          the real flagship step (gyroplane decoder, MC KL)
    lin_gyro      gyroplane layer replaced by gelu(logmap0(z) @ W + b)
                  with the SAME (P, D) weights — isolates the gyroplane
                  epilogue (arsinh/norm chain) vs a plain matmul
    no_kl         KL chain off: recon-only loss (keeps rsample)
    no_sample     + sampling chain off: decode(mu) directly
    euclid_adam   full loss, plain optax.adam instead of riemannian_adam
                  — isolates rgrad/expmap-retraction/transport cost
    fwd           forward loss only (no grads, no optimizer)

  width control (MXU lane-occupancy ceiling, measured): hidden_dims
  (64,16) [reference, vae_hyperbolic_gyroplane_decoder.py:56-74] vs
  (256,64) vs (1024,256) at the full step — if the tiny reference
  widths cap occupancy, achieved TFLOPs as a fraction of the measured
  device peak must RISE with width (analytic MLP FLOPs grow ~w^2 while
  the manifold/VPU chain is width-independent).

  batch control at the reference width: B in {256, 1024, 4096} — the
  other occupancy axis (more MXU rows per step, fewer serial steps).

Run on the real chip: python benchmarks/flagship_roofline.py
Writes benchmarks/FLAGSHIP_ROOFLINE.json.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def mlp_flops_per_sample_fwd(data_numel: int, hidden, latent_dim: int) -> int:
    """Analytic forward matmul FLOPs/sample (2*MACs) of the flagship:
    encoder Dense stack + mu/scale heads + gyroplane matmul + decoder
    Dense stack + output layer. VPU elementwise work excluded (that is
    the point: the ladder measures it instead)."""
    h0, h1 = hidden
    macs = (
        data_numel * h0 + h0 * h1            # encoder
        + h1 * latent_dim * 2                # mu + scale heads
        + latent_dim * h1                    # gyroplane (B,D)@(D,P)
        + h1 * h0 + h0 * data_numel          # decoder + out
    )
    return 2 * macs


def build_chunk_fn(model, n, batch, mode, n_epochs, lr=1e-3):
    """K-epochs-per-dispatch lax.scan of the (possibly ablated)
    flagship train step: outer scan over epochs, inner scan over steps,
    ONE device dispatch for the whole chunk."""
    import jax
    import jax.numpy as jnp
    import optax

    from hyperbolic_vae_tpu.distributions import (
        relaxed_bernoulli_log_prob,
        wrapped_normal_log_prob,
        wrapped_normal_rsample,
    )
    from hyperbolic_vae_tpu.optim import riemannian_adam

    steps = n // batch
    ball = model.ball
    if mode == "euclid_adam":
        optimizer = optax.adam(lr)
    else:
        optimizer = riemannian_adam(lr, ball=ball)

    def decode_lin_gyro(p, z):
        # same weights, same matmul shape — gyro epilogue replaced by
        # the tangent-space linear map
        h = ball.logmap0(z) @ p["gyroplanes"]["mp_points"].T
        h = jax.nn.gelu(h + p["gyroplanes"]["bias"])
        h = jax.nn.gelu(h @ p["dec_0"]["kernel"] + p["dec_0"]["bias"])
        return jax.nn.sigmoid(h @ p["out"]["kernel"] + p["out"]["bias"])

    def arm_loss(p, xb, key):
        mu, scale = model.apply({"params": p}, xb, method="encode")
        if mode == "no_sample":
            z = mu
        else:
            z = wrapped_normal_rsample(key, ball, mu, scale)
        if mode == "lin_gyro":
            x_hat = decode_lin_gyro(p, z)
        else:
            x_hat = model.apply({"params": p}, z, method="decode")
        xf = xb.reshape(xb.shape[0], -1)
        xhf = x_hat.reshape(xb.shape[0], -1)
        recon = -jnp.sum(relaxed_bernoulli_log_prob(xf, 1.0, probs=xhf), axis=-1)
        if mode in ("no_kl", "no_sample"):
            return jnp.mean(recon)
        log_q = wrapped_normal_log_prob(ball, mu, scale, z)
        origin = jnp.zeros((model.latent_dim,), jnp.float32)
        log_p = wrapped_normal_log_prob(
            ball, origin, jnp.ones((model.latent_dim,)), z
        )
        return jnp.mean(recon + (log_q - log_p))

    def run(params, opt_state, xd, key):
        def epoch(carry, e):
            params, opt_state = carry
            ekey = jax.random.fold_in(key, e)
            offs = jax.random.randint(ekey, (steps,), 0, n - batch + 1)

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

            (params, opt_state, _), losses = jax.lax.scan(
                step, (params, opt_state, ekey), offs
            )
            return (params, opt_state), jnp.mean(losses)

        (params, opt_state), losses = jax.lax.scan(
            epoch, (params, opt_state), jnp.arange(n_epochs)
        )
        return params, opt_state, jnp.mean(losses)

    return jax.jit(run, donate_argnums=(0, 1)), steps, optimizer


def time_chunk(fn, make_state, xd, iters=5):
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
    ap.add_argument("--n", type=int, default=60000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, nargs=2, default=[5, 25],
                    help="the two chunk lengths the slope is fit over")
    ap.add_argument("--batches", type=int, nargs="+", default=[256, 1024, 4096])
    ap.add_argument(
        "--widths", type=str, nargs="+", default=["64x16", "256x64", "1024x256"]
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.bench_rnaseq import calibrate_device_peak
    from hyperbolic_vae_tpu.models import GyroplaneVAE

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, (args.n, 28, 28, 1)).astype(np.float32)
    xd = jnp.asarray(x)
    B, n = args.batch, args.n
    K1, K2 = args.k
    shape = (28, 28, 1)

    peak = calibrate_device_peak()
    results = {
        "device": str(jax.devices()[0]), "n": n, "batch": B,
        "k_slope": [K1, K2],
        "measured_device_matmul_tflops": peak,
        "method": "device ms/epoch = (t_K2 - t_K1) / (K2 - K1), median of "
                  "5 synchronized chunk dispatches per K (trap 6: single "
                  "epochs are dispatch-dominated on axon)",
    }

    def make_model(hidden=(64, 16)):
        return GyroplaneVAE(
            data_shape=shape, latent_dim=2, manifold_curvature=1.0,
            hidden_dims=tuple(hidden),
        )

    def state_for(model, optimizer):
        def make():
            v = model.init(
                {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                xd[:2],
            )
            params = v["params"]
            return params, optimizer.init(params)
        return make

    def run_arm(model, batch, mode):
        """Slope-timed device ms/epoch for one arm."""
        times = {}
        for K in (K1, K2):
            fn, steps, optimizer = build_chunk_fn(model, n, batch, mode, K)
            dt, _ = time_chunk(fn, state_for(model, optimizer), xd)
            times[K] = dt
        dev_s = (times[K2] - times[K1]) / (K2 - K1)
        return {
            "device_ms_per_epoch": round(dev_s * 1e3, 3),
            "device_samples_per_sec": round((n // batch) * batch / dev_s, 1),
        }, dev_s

    # ---- ablation ladder at the reference config ----
    ladder = {}
    ref_model = make_model()
    for mode in ("full", "lin_gyro", "no_kl", "no_sample", "euclid_adam", "fwd"):
        ladder[mode], _ = run_arm(ref_model, B, mode)
        print(json.dumps({mode: ladder[mode]}), file=sys.stderr, flush=True)
    results["ablation_b256_f32"] = ladder
    key = "device_ms_per_epoch"
    results["attribution_ms_per_epoch"] = {
        "gyroplane_epilogue_vs_linear": round(
            ladder["full"][key] - ladder["lin_gyro"][key], 3
        ),
        "kl_chain": round(ladder["full"][key] - ladder["no_kl"][key], 3),
        "sampling_chain": round(
            ladder["no_kl"][key] - ladder["no_sample"][key], 3
        ),
        "riemannian_vs_euclid_adam": round(
            ladder["full"][key] - ladder["euclid_adam"][key], 3
        ),
        "bwd_plus_optimizer": round(ladder["full"][key] - ladder["fwd"][key], 3),
    }

    # ---- width control ----
    widths = {}
    for spec in args.widths:
        h0, h1 = (int(v) for v in spec.split("x"))
        model = make_model((h0, h1))
        fwd_flops = mlp_flops_per_sample_fwd(784, (h0, h1), 2)
        arm, dev_s = run_arm(model, B, "full")
        train_tflops = 3 * fwd_flops * (n // B) * B / dev_s / 1e12
        widths[f"h{h0}x{h1}"] = {
            **arm,
            "mlp_flops_per_sample_fwd": fwd_flops,
            "achieved_tflops": round(train_tflops, 3),
            "pct_of_measured_device_peak": round(
                100 * train_tflops / peak["float32"], 2
            ),
        }
        print(json.dumps({spec: widths[f"h{h0}x{h1}"]}), file=sys.stderr, flush=True)
    results["width_control_full_step"] = widths

    # ---- batch control at the reference width ----
    batches = {}
    fwd_flops = mlp_flops_per_sample_fwd(784, (64, 16), 2)
    for b in args.batches:
        arm, dev_s = run_arm(ref_model, b, "full")
        train_tflops = 3 * fwd_flops * (n // b) * b / dev_s / 1e12
        batches[f"b{b}"] = {
            **arm,
            "achieved_tflops": round(train_tflops, 3),
            "pct_of_measured_device_peak": round(
                100 * train_tflops / peak["float32"], 2
            ),
        }
        print(json.dumps({f"b{b}": batches[f"b{b}"]}), file=sys.stderr, flush=True)
    results["batch_control_ref_width"] = batches

    (REPO_ROOT / "benchmarks" / "FLAGSHIP_ROOFLINE.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
