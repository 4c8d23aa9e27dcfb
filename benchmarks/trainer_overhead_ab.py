"""Same-session A/B: what does the PRODUCTION epoch/chunk program cost
over a minimal train-only epoch at the flagship bench config?

Motivated by FLAGSHIP_ROOFLINE (round 5): a minimal whole-epoch train
scan measures ~6.4 ms/epoch device while BENCH_r04's production chunk
records ~13.8 ms/epoch. Chip phase can explain some of that (trap 5),
so this script measures BOTH endpoints — and the ladder between them —
fresh in ONE session, slope-timed (K=5 vs K=25 chunks, dispatch
overhead differenced out, trap 6):

  minimal        flagship_roofline's "full" arm: dynamic-slice batches,
                 value_and_grad, riemannian_adam, scalar loss carry
  minimal_guard  + the in-graph failure containment exactly as
                 epoch_program.py builds it (optax.global_norm, isfinite
                 check, where-select over params AND opt_state)
  prod_epoch     the Trainer's real train_body (adds the 3-metric dict,
                 optax inject_hyperparams lr, per-epoch metric means) —
                 scanned K epochs with no eval/controllers
  prod_chunk     the Trainer's real chunk program as bench.py times it
                 (adds full val eval + in-graph best-params tracking +
                 plateau/early-stop controller folds per epoch)

Attribution = successive differences. Run on the real chip:
python benchmarks/trainer_overhead_ab.py
Writes benchmarks/TRAINER_OVERHEAD_AB.json.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from benchmarks.flagship_roofline import build_chunk_fn, time_chunk


def build_minimal_guard_fn(model, n, batch, n_epochs, lr=1e-3):
    """The minimal chunk + the epoch_program.py failure-containment
    block verbatim (epoch_program.py:163-180 semantics)."""
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
    optimizer = riemannian_adam(lr, ball=ball)

    def arm_loss(p, xb, key):
        mu, scale = model.apply({"params": p}, xb, method="encode")
        z = wrapped_normal_rsample(key, ball, mu, scale)
        x_hat = model.apply({"params": p}, z, method="decode")
        xf = xb.reshape(xb.shape[0], -1)
        xhf = x_hat.reshape(xb.shape[0], -1)
        recon = -jnp.sum(relaxed_bernoulli_log_prob(xf, 1.0, probs=xhf), axis=-1)
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
                loss, grads = jax.value_and_grad(arm_loss)(params, xb, sk)
                gnorm = optax.global_norm(grads)
                ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
                updates, new_opt_state = optimizer.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                params = jax.tree.map(
                    lambda nw, o: jnp.where(ok, nw, o), new_params, params
                )
                opt_state = jax.tree.map(
                    lambda nw, o: jnp.where(ok, nw, o), new_opt_state, opt_state
                )
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=512)
    ap.add_argument("--k", type=int, nargs=2, default=[5, 25])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.train import Trainer

    rng = np.random.default_rng(0)
    n, B, K1, K2 = args.n, args.batch, *args.k
    x = rng.uniform(0.0, 1.0, (n, 28, 28, 1)).astype(np.float32)
    xd = jnp.asarray(x)
    xv = jnp.asarray(x[: args.n_val])
    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2,
                         manifold_curvature=1.0)
    trainer = Trainer(model, max_epochs=1, early_stopping_patience=None,
                      check_finite=False, shuffle="block")

    results = {
        "device": str(jax.devices()[0]), "n": n, "batch": B,
        "n_val": args.n_val, "k_slope": [K1, K2],
        "method": "device ms/epoch by K-slope, same session, all arms",
    }

    def init_state():
        params = trainer.init_params(xd)
        return params, trainer._optimizer.init(params)

    def slope(time_K):
        t1, t2 = time_K(K1), time_K(K2)
        return (t2 - t1) / (K2 - K1)

    arms = {}

    # -- minimal & minimal_guard (roofline-style builders) --
    for name, builder in (
        ("minimal", lambda K: build_chunk_fn(model, n, B, "full", K)),
        ("minimal_guard", lambda K: build_minimal_guard_fn(model, n, B, K)),
    ):
        def time_K(K, builder=builder):
            fn, _, optimizer = builder(K)
            def make():
                params = trainer.init_params(xd)
                return params, optimizer.init(params)
            dt, _ = time_chunk(fn, make, xd)
            return dt
        dev_s = slope(time_K)
        arms[name] = {"device_ms_per_epoch": round(dev_s * 1e3, 3)}
        print(json.dumps({name: arms[name]}), file=sys.stderr, flush=True)

    # -- prod_epoch: the Trainer's real train_body, K-scanned --
    trainer._build_epoch_fns(n, B, args.n_val)
    train_body, _eval_full = trainer._body_fns_cache[(n, B, args.n_val)]

    def build_prod_epoch(K):
        def run(params, opt_state, xall, key):
            def epoch(carry, e):
                params, opt_state = carry
                ekey = jax.random.fold_in(key, e)
                params, opt_state, ms = train_body(params, opt_state, xall, ekey)
                return (params, opt_state), ms["loss_total"]

            (params, opt_state), losses = jax.lax.scan(
                epoch, (params, opt_state), jnp.arange(K)
            )
            return params, opt_state, jnp.mean(losses)

        return jax.jit(run, donate_argnums=(0, 1))

    def time_prod_epoch(K):
        fn = build_prod_epoch(K)
        dt, _ = time_chunk(fn, init_state, xd)
        return dt

    dev_s = slope(time_prod_epoch)
    arms["prod_epoch"] = {"device_ms_per_epoch": round(dev_s * 1e3, 3)}
    print(json.dumps({"prod_epoch": arms["prod_epoch"]}), file=sys.stderr,
          flush=True)

    # -- prod_chunk: the real chunk program, exactly as bench.py times it --
    import time as _time

    def time_prod_chunk(K, reps=5):
        chunk_fn = trainer._chunk_fn(n, B, args.n_val, K)
        params, opt_state = init_state()
        best = jax.tree.map(jnp.copy, params)
        ctrl = trainer._init_ctrl()
        key = jax.random.PRNGKey(0)
        p, o = params, opt_state
        for _ in range(2):  # compile + warmup
            key, k = jax.random.split(key)
            p, o, best, ctrl, k, tms, vms, _ = chunk_fn(p, o, best, ctrl, xd, xv, k)
            float(tms["loss_total"][-1])
        ts = []
        for _ in range(reps):
            key, k = jax.random.split(key)
            t0 = _time.perf_counter()
            p, o, best, ctrl, k, tms, vms, _ = chunk_fn(p, o, best, ctrl, xd, xv, k)
            float(tms["loss_total"][-1])
            ts.append(_time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    dev_s = slope(time_prod_chunk)
    arms["prod_chunk"] = {"device_ms_per_epoch": round(dev_s * 1e3, 3)}
    print(json.dumps({"prod_chunk": arms["prod_chunk"]}), file=sys.stderr,
          flush=True)

    results["arms"] = arms
    key = "device_ms_per_epoch"
    results["attribution_ms_per_epoch"] = {
        "finite_guard": round(arms["minimal_guard"][key] - arms["minimal"][key], 3),
        "metrics_dict_plus_lr_inject": round(
            arms["prod_epoch"][key] - arms["minimal_guard"][key], 3
        ),
        "eval_best_controllers": round(
            arms["prod_chunk"][key] - arms["prod_epoch"][key], 3
        ),
        "total_production_overhead": round(
            arms["prod_chunk"][key] - arms["minimal"][key], 3
        ),
    }
    print(json.dumps(results["attribution_ms_per_epoch"]), file=sys.stderr,
          flush=True)

    (REPO_ROOT / "benchmarks" / "TRAINER_OVERHEAD_AB.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
