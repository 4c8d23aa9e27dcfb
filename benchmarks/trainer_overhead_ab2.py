"""Second-stage attribution of TRAINER_OVERHEAD_AB's +4.7 ms/epoch
"eval_best_controllers" lump: the val eval itself is ~2 scanned
forward batches (~0.03 ms of compute), so the cost must live in the
chunk body's WRAPPING — prime suspect the per-epoch scalar `lax.cond`
early-stop skip (its vmapped sibling cost 5.8x the bodies it guarded,
ENSEMBLE_LAYOUT_AB; a scalar cond lowers to a real HLO conditional,
but conditionals inside a scan can still defeat XLA pipelining).

Arms (slope-timed K=5 vs K=25, same session, flagship bench config):

  prod_epoch         Trainer train_body K-scanned (no eval, no chunk
                     wrapping) — re-measured as this session's anchor
  prod_epoch_eval    + eval_full per epoch (still no cond/best/ctrl)
  prod_chunk_masked  the REAL chunk body built with masked_skip=True
                     (unconditional epoch + where-masking — the
                     vmapped-ensemble body, values bit-identical)
  prod_chunk_cond    the production single-seed chunk body (lax.cond)

Run on the real chip: python benchmarks/trainer_overhead_ab2.py
Writes benchmarks/TRAINER_OVERHEAD_AB2.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time as _time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


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
    from hyperbolic_vae_tpu.train.chunk_program import build_chunk_body

    rng = np.random.default_rng(0)
    n, B, K1, K2 = args.n, args.batch, *args.k
    x = rng.uniform(0.0, 1.0, (n, 28, 28, 1)).astype(np.float32)
    xd = jnp.asarray(x)
    xv = jnp.asarray(x[: args.n_val])
    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2,
                         manifold_curvature=1.0)
    trainer = Trainer(model, max_epochs=1, early_stopping_patience=None,
                      check_finite=False, shuffle="block")
    trainer._build_epoch_fns(n, B, args.n_val)
    train_body, eval_full = trainer._body_fns_cache[(n, B, args.n_val)]

    results = {
        "device": str(jax.devices()[0]), "n": n, "batch": B,
        "n_val": args.n_val, "k_slope": [K1, K2],
    }

    def init_state():
        params = trainer.init_params(xd)
        return params, trainer._optimizer.init(params)

    def build_epoch_scan(K, with_eval):
        def run(params, opt_state, xall, xval, key):
            def epoch(carry, e):
                params, opt_state = carry
                ek = jax.random.fold_in(key, e)
                vk = jax.random.fold_in(key, -(e + 1))
                params, opt_state, ms = train_body(params, opt_state, xall, ek)
                out = ms["loss_total"]
                if with_eval:
                    vms = eval_full(params, xval, vk)
                    out = out + 0.0 * vms["loss_total"]  # keep it live
                return (params, opt_state), out

            (params, opt_state), losses = jax.lax.scan(
                epoch, (params, opt_state), jnp.arange(K)
            )
            return params, opt_state, jnp.mean(losses)

        return jax.jit(run, donate_argnums=(0, 1))

    def time_epoch_scan(K, with_eval, reps=5):
        fn = build_epoch_scan(K, with_eval)
        params, opt_state = init_state()
        key = jax.random.PRNGKey(0)
        for _ in range(2):
            key, k = jax.random.split(key)
            params, opt_state, loss = fn(params, opt_state, xd, xv, k)
            float(loss)
        ts = []
        for _ in range(reps):
            key, k = jax.random.split(key)
            t0 = _time.perf_counter()
            params, opt_state, loss = fn(params, opt_state, xd, xv, k)
            float(loss)
            ts.append(_time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def time_chunk_body(K, masked, reps=5):
        chunk = build_chunk_body(trainer, train_body, eval_full, K,
                                 masked_skip=masked)
        fn = jax.jit(chunk, donate_argnums=(0, 1, 2, 3))
        params, opt_state = init_state()
        best = jax.tree.map(jnp.copy, params)
        ctrl = trainer._init_ctrl()
        key = jax.random.PRNGKey(0)
        p, o = params, opt_state
        for _ in range(2):
            key, k = jax.random.split(key)
            p, o, best, ctrl, k, tms, vms, _ = fn(p, o, best, ctrl, xd, xv, k)
            float(tms["loss_total"][-1])
        ts = []
        for _ in range(reps):
            key, k = jax.random.split(key)
            t0 = _time.perf_counter()
            p, o, best, ctrl, k, tms, vms, _ = fn(p, o, best, ctrl, xd, xv, k)
            float(tms["loss_total"][-1])
            ts.append(_time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def slope(time_K):
        t1, t2 = time_K(K1), time_K(K2)
        return (t2 - t1) / (K2 - K1)

    arms = {}
    for name, timer in (
        ("prod_epoch", lambda K: time_epoch_scan(K, False)),
        ("prod_epoch_eval", lambda K: time_epoch_scan(K, True)),
        ("prod_chunk_masked", lambda K: time_chunk_body(K, True)),
        ("prod_chunk_cond", lambda K: time_chunk_body(K, False)),
    ):
        dev_s = slope(timer)
        arms[name] = {"device_ms_per_epoch": round(dev_s * 1e3, 3)}
        print(json.dumps({name: arms[name]}), file=sys.stderr, flush=True)

    results["arms"] = arms
    key = "device_ms_per_epoch"
    results["attribution_ms_per_epoch"] = {
        "val_eval_fold": round(
            arms["prod_epoch_eval"][key] - arms["prod_epoch"][key], 3
        ),
        "best_tracking_controllers_masked_wrap": round(
            arms["prod_chunk_masked"][key] - arms["prod_epoch_eval"][key], 3
        ),
        "scalar_cond_over_masked": round(
            arms["prod_chunk_cond"][key] - arms["prod_chunk_masked"][key], 3
        ),
    }
    print(json.dumps(results["attribution_ms_per_epoch"]), file=sys.stderr,
          flush=True)

    (REPO_ROOT / "benchmarks" / "TRAINER_OVERHEAD_AB2.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
