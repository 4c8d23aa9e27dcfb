"""Experiment 9: pvae-replication grid — WrappedNormal vs
RiemannianNormal posteriors with IWAE evaluation.

Reference: /root/reference/scripts/_9_pvae_replicate.py records the
target config (784 -> 600 ReLU -> 2, batch 128, lr 5e-4, 80 epochs,
5000-sample IWAE eval; :5-30, :200-210) but is itself a SyntaxError
(:190-198). This is the runnable version, including the
RiemannianNormal path the reference never got working.
"""

import json

import jax
import jax.numpy as jnp

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import mnist
from hyperbolic_vae_tpu.models import PvaeMLPVAE
from hyperbolic_vae_tpu.train import Trainer


def iwae_eval(model, params, dm, k: int, seed: int = 0, chunk: int = 256) -> float:
    """K-sample IWAE on the test split, chunked to bound memory."""
    vals = []
    x_test = dm.x_test
    n = (len(x_test) // chunk) * chunk
    f = jax.jit(
        lambda x, key: model.apply(
            {"params": params}, x, k, method="iwae", rngs={"sample": key}
        )
    )
    for i in range(0, n, chunk):
        key = jax.random.PRNGKey(seed + i)
        # iwae returns per-sample bounds (B,); equal-size chunks, so the
        # mean of chunk means equals the split mean
        vals.append(float(jnp.mean(f(jnp.asarray(x_test[i : i + chunk]), key))))
    return sum(vals) / max(len(vals), 1)


def iwae_eval_lanes(model_fn, sweep, lanes, dm, k: int, seed: int = 0,
                    chunk: int = 256) -> list:
    """K-sample IWAE for ALL lanes in one vmapped program per chunk
    (same chunk key path as iwae_eval, so lane results match per-cell
    sequential evaluation)."""
    import numpy as np

    hp_stack = {
        "manifold_curvature": jnp.asarray(
            [float(l["manifold_curvature"]) for l in lanes], jnp.float32
        )
    }
    best = jax.tree.map(lambda *xs: jnp.stack(xs), *[r.best_params for r in sweep])

    def one(p, hp, x, key):
        return model_fn(hp).apply(
            {"params": p}, x, k, method="iwae", rngs={"sample": key}
        )

    f = jax.jit(jax.vmap(one, in_axes=(0, 0, None, None)))
    x_test = dm.x_test
    n = (len(x_test) // chunk) * chunk
    vals = []
    for i in range(0, n, chunk):
        key = jax.random.PRNGKey(seed + i)
        vals.append(np.asarray(f(best, hp_stack, jnp.asarray(x_test[i : i + chunk]), key)))
    # (n_chunks, S, B) per-sample bounds -> per-lane means
    per_lane = np.mean(np.stack(vals, axis=0), axis=(0, 2))
    return [float(v) for v in per_lane]


def lane_sweep_replicate(args, run_dir, dm):
    """Curvature cells of each (posterior, latent_dim) group as vmapped
    lanes of one program (the per-cell sequential loop below re-pays a
    relay compile per curvature; lanes share one per group)."""
    seed_mesh = None
    if getattr(args, "seed_mesh", 0):
        from hyperbolic_vae_tpu.parallel import make_seed_mesh

        seed_mesh = make_seed_mesh(args.seed_mesh)
    results = {}
    for posterior in args.posteriors:
        for d in args.latent_dims:
            def model_fn(hp, _p=posterior, _d=d):
                return PvaeMLPVAE(
                    data_shape=dm.input_shape, latent_dim=_d,
                    manifold_curvature=hp["manifold_curvature"],
                    posterior=_p, lr=args.lr,
                )

            lanes = [
                {"manifold_curvature": c, "seed": args.seed}
                for c in args.curvatures
            ]
            group = f"{posterior}_d{d}"
            trainer = Trainer(
                model_fn(lanes[0]), lr=args.lr, max_epochs=args.epochs,
                seed=args.seed, hp_model_fn=model_fn,
                early_stopping_patience=None if args.no_early_stopping else 10,
                log_dir=str(run_dir / group),
                **trainer_extra(args),
            )
            sweep = trainer.fit_lane_sweep(dm, lanes, seed_mesh=seed_mesh)
            iwaes = iwae_eval_lanes(model_fn, sweep, lanes, dm, args.iwae_k)
            for lane, r, iwae in zip(lanes, sweep, iwaes):
                c = lane["manifold_curvature"]
                tag = f"{posterior}_c{c}_d{d}"
                results[tag] = {
                    "best_val": r.best_metric,
                    f"iwae_{args.iwae_k}": iwae,
                }
                print(tag, results[tag])
    return results


if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--posteriors", type=str, nargs="+", default=["wrapped", "riemannian"])
    parser.add_argument("--curvatures", type=float, nargs="+", default=[1.0])
    parser.add_argument("--latent-dims", type=int, nargs="+", default=[2])
    parser.add_argument("--iwae-k", type=int, default=5000)
    parser.add_argument(
        "--lane-sweep", action="store_true",
        help="train each (posterior, latent_dim) group's curvature cells "
        "as vmapped lanes of one compiled program",
    )
    parser.add_argument(
        "--seed-mesh", type=int, default=0,
        help="with --lane-sweep: shard the lanes over this many devices "
        "(1-D 'seed' mesh; len(curvatures) must divide it evenly); 0 = off",
    )
    parser.set_defaults(epochs=80, batch_size=128, lr=5e-4)
    args = parser.parse_args()
    run_dir = setup(args, "pvae_replicate")
    dm = mnist.make_data_module(
        batch_size=args.batch_size, data_dir=args.data_dir,
        synthetic=args.synthetic, n_train=args.n_train,
    )
    if args.lane_sweep:
        if args.use_mesh:
            raise SystemExit("--use-mesh does not compose with --lane-sweep")
        results = lane_sweep_replicate(args, run_dir, dm)
        out = {k: {m: float(v) for m, v in r.items()} for k, r in results.items()}
        (run_dir / "replicate_results.json").write_text(json.dumps(out, indent=2))
        print(json.dumps(out, indent=2))
        raise SystemExit(0)
    results = {}
    for posterior in args.posteriors:
        for c in args.curvatures:
            for d in args.latent_dims:
                tag = f"{posterior}_c{c}_d{d}"
                model = PvaeMLPVAE(
                    data_shape=dm.input_shape,
                    latent_dim=d,
                    manifold_curvature=c,
                    posterior=posterior,
                    lr=args.lr,
                )
                trainer = Trainer(
                    model,
                    lr=args.lr,
                    max_epochs=args.epochs,
                    seed=args.seed,
                    early_stopping_patience=None if args.no_early_stopping else 10,
                    log_dir=str(run_dir / tag),
                    use_mesh=args.use_mesh,
                    **trainer_extra(args),
                )
                result = trainer.fit(dm)
                iwae = iwae_eval(model, result.best_params, dm, args.iwae_k)
                results[tag] = {
                    "best_val": result.best_metric,
                    f"iwae_{args.iwae_k}": iwae,
                }
                print(tag, results[tag])
    out = {k: {m: float(v) for m, v in r.items()} for k, r in results.items()}
    (run_dir / "replicate_results.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
