"""A/B the gyroplane-distance dispatch: Pallas kernel vs jnp epilogue.

Round-4 conv roofline (benchmarks/CONV_ROOFLINE.json) found the Pallas
forward arm 42% SLOWER than the pure-jnp analytic path inside the full
conv-VAE train step (42.9 vs 30.2 ms/epoch, b256 f32) — the op is
epilogue/bandwidth-bound at latent D=2, and XLA fuses the jnp epilogue
into neighboring kernels while the Pallas call is a fusion barrier plus
an extra dispatch. This script pins the decision for the OTHER user of
``gyroplane_distances_fast`` (the RNA-seq family, P=hidden planes) and
for the raw op across the (B, P) plane, all in one session so chip-phase
variance (CLAUDE.md trap 5) cannot fake a verdict:

  * full RNASeqVAE train-step epochs (loss + grads + Riemannian Adam,
    whole-epoch lax.scan, donated state) with the Pallas arm vs the jnp
    arm toggled via ops.gyroplane._PALLAS_MIN_WORK;
  * standalone fwd and fwd+bwd (grad-of-sum, exercising the custom VJP)
    micro-rooflines over a (B, P) table at D=2.

Run on the real chip: python benchmarks/gyroplane_dispatch_ab.py
Writes benchmarks/GYRO_DISPATCH.json — the measured basis for the
dispatch default in ops/gyroplane.py.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def build_rnaseq_epoch(model, n, batch, lr=1e-3):
    """Whole-epoch scan of the real train step (model.loss)."""
    import jax
    import jax.numpy as jnp
    import optax

    from hyperbolic_vae_tpu.optim import riemannian_adam

    steps = n // batch
    optimizer = riemannian_adam(lr, ball=model.ball)

    def loss_fn(p, xb, key):
        out = model.apply({"params": p}, xb, method="loss", rngs={"sample": key})
        return out["loss_total"]

    def run(params, opt_state, xd, key):
        def step(carry, off):
            params, opt_state, skey = carry
            skey, sk = jax.random.split(skey)
            xb = jax.lax.dynamic_slice_in_dim(xd, off, batch, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, sk)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, skey), loss

        offs = jax.random.randint(key, (steps,), 0, n - batch + 1)
        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, key), offs
        )
        return params, opt_state, jnp.mean(losses)

    return jax.jit(run, donate_argnums=(0, 1)), steps


def time_fn(fn, make_state, xd, iters=5):
    """Median synchronized wall time of the donated whole-epoch program."""
    import jax

    from benchmarks._timing import median_time

    state = {"po": make_state(), "key": jax.random.PRNGKey(0)}

    def step():
        state["key"], k = jax.random.split(state["key"])
        params, opt_state, loss = fn(*state["po"], xd, k)
        float(loss)  # axon sync (block_until_ready returns at enqueue)
        state["po"] = (params, opt_state)

    return median_time(step, warmup=2, reps=iters)


def time_op(fn, args_fn, iters=20):
    """Median time of a jitted op; data passed as args (no constants —
    the remote compile relay 413s on giant embedded arrays)."""
    import jax

    from benchmarks._timing import median_time

    a = args_fn()

    def step():
        out = fn(*a)
        float(jax.tree.leaves(out)[0].ravel()[0])  # sync

    return median_time(step, warmup=1, reps=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--genes", type=int, default=2048)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--op-iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import hyperbolic_vae_tpu.ops.gyroplane as gyro
    from hyperbolic_vae_tpu.models import RNASeqVAE
    from hyperbolic_vae_tpu.optim import riemannian_adam

    results = {
        "device": str(jax.devices()[0]),
        "config": vars(args),
        "note": (
            "pallas = current kernel forward; jnp = analytic epilogue "
            "(XLA-fused). Same session, median of repeats."
        ),
    }

    rng = np.random.default_rng(0)
    xd = jnp.asarray(
        rng.uniform(0.0, 1.0, (args.n, args.genes)).astype(np.float32)
    )
    model = RNASeqVAE(
        in_features=args.genes, hidden_dim=args.hidden, latent_dim=2
    )

    def make_state():
        v = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            xd[:2],
        )
        params = v["params"]
        return params, riemannian_adam(1e-3, ball=model.ball).init(params)

    # ---- full train-step epochs, both arms, interleaved A/B ----
    full = {}
    for arm, min_work in (("pallas", 256 * 256), ("jnp", 1 << 60)):
        orig = gyro._PALLAS_MIN_WORK
        try:
            gyro._PALLAS_MIN_WORK = min_work
            fn, steps = build_rnaseq_epoch(model, args.n, args.batch)
            dt = time_fn(fn, make_state, xd)
        finally:
            gyro._PALLAS_MIN_WORK = orig
        full[arm] = {
            "epoch_ms": round(dt * 1e3, 2),
            "samples_per_sec": round(steps * args.batch / dt, 1),
        }
        print(json.dumps({f"rnaseq_full_{arm}": full[arm]}), flush=True)
    results["rnaseq_full_step"] = full

    # ---- standalone op across the (B, P) plane, fwd and fwd+bwd ----
    table = []
    for B, P in ((256, 256), (256, 512), (1024, 1024), (4096, 1024), (8192, 2048)):
        row = {"B": B, "P": P}
        xa = jnp.asarray(rng.normal(0, 0.1, (B, 2)).astype(np.float32))
        pa = jnp.asarray(rng.normal(0, 0.1, (P, 2)).astype(np.float32))

        fwd_jnp = jax.jit(lambda x, p: gyro.gyroplane_distances(x, p, 1.0))
        fwd_pal = jax.jit(
            lambda x, p: gyro.gyroplane_distances_pallas(x, p, 1.0)
        )
        bwd_jnp = jax.jit(
            jax.grad(lambda x, p: jnp.sum(gyro.gyroplane_distances(x, p, 1.0) ** 2))
        )

        def fast_loss(x, p):
            return jnp.sum(gyro.gyroplane_distances_fast(x, p, 1.0, True, None) ** 2)

        orig = gyro._PALLAS_MIN_WORK
        try:
            gyro._PALLAS_MIN_WORK = 0  # force the kernel forward
            bwd_pal = jax.jit(jax.grad(fast_loss))
            row["fwd_jnp_ms"] = round(time_op(fwd_jnp, lambda: (xa, pa), args.op_iters) * 1e3, 3)
            row["fwd_pallas_ms"] = round(time_op(fwd_pal, lambda: (xa, pa), args.op_iters) * 1e3, 3)
            row["grad_jnp_ms"] = round(time_op(bwd_jnp, lambda: (xa, pa), args.op_iters) * 1e3, 3)
            row["grad_pallasfwd_ms"] = round(time_op(bwd_pal, lambda: (xa, pa), args.op_iters) * 1e3, 3)
        finally:
            gyro._PALLAS_MIN_WORK = orig
        table.append(row)
        print(json.dumps(row), flush=True)
    results["op_table_d2"] = table

    out = Path(__file__).parent / "GYRO_DISPATCH.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
