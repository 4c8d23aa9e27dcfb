"""Experiment 6 (FLAGSHIP): MLP gyroplane VAE on MNIST, Poincare 2-D
latent, c = 1.0 — the driver's headline benchmark config.

Reference: /root/reference/scripts/_6_train_vae_hyperbolic_mnist_gyroplane.py:20-65
(model at models/vae_hyperbolic_gyroplane_decoder.py:42). The reference
wraps fit in torch detect_anomaly(check_nan=True) (:64); here the
trainer's per-epoch isfinite guard covers it (enable jax_debug_nans for
the step-level equivalent).
"""

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import mnist
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import (
    GenerateCallback,
    LatentInterpolationCallback,
    LatentScatterCallback,
    Trainer,
)


def train_seed_sweep(args, run_dir, latent_dim: int):
    """--seeds a b c …: train every seed SIMULTANEOUSLY in one vmapped
    program (Trainer.fit_ensemble) — per-seed results match sequential
    fits; checkpoints/callbacks are off in this mode (train/ensemble.py)."""
    dm = mnist.make_data_module(
        batch_size=args.batch_size,
        data_dir=args.data_dir,
        synthetic=args.synthetic,
        n_train=args.n_train,
    )
    model = GyroplaneVAE(
        data_shape=dm.input_shape,
        latent_dim=latent_dim,
        manifold_curvature=args.curvature,
        beta=args.beta,
        prior_scale=args.prior_scale,
        lr=args.lr,
    )
    trainer = Trainer(
        model,
        lr=args.lr,
        max_epochs=args.epochs,
        early_stopping_patience=None if args.no_early_stopping else 10,
        log_dir=str(run_dir),
        **trainer_extra(args, model),
    )
    if args.use_mesh:
        raise SystemExit(
            "--use-mesh (data parallelism) does not compose with --seeds; "
            "shard the sweep itself with --seed-mesh N instead"
        )
    seed_mesh = None
    if getattr(args, "seed_mesh", 0):
        from hyperbolic_vae_tpu.parallel import make_seed_mesh

        seed_mesh = make_seed_mesh(args.seed_mesh)
    results = trainer.fit_ensemble(dm, args.seeds, seed_mesh=seed_mesh)
    for seed, r in zip(args.seeds, results):
        print(f"seed={seed} epochs={r.epochs_run} "
              f"best {trainer.monitor}={r.best_metric:.4f}")
    print(f"ensemble samples/sec={results[0].samples_per_sec:.0f} "
          f"({len(args.seeds)} seeds in one program)")
    return results


def train_latent_dim(args, run_dir, latent_dim: int):
    dm = mnist.make_data_module(
        batch_size=args.batch_size,
        data_dir=args.data_dir,
        synthetic=args.synthetic,
        n_train=args.n_train,
    )
    model = GyroplaneVAE(
        data_shape=dm.input_shape,
        latent_dim=latent_dim,
        manifold_curvature=args.curvature,
        beta=args.beta,
        prior_scale=args.prior_scale,
        lr=args.lr,
    )
    trainer = Trainer(
        model,
        lr=args.lr,
        max_epochs=args.epochs,
        seed=args.seed,
        early_stopping_patience=None if args.no_early_stopping else 10,
        log_dir=str(run_dir),
        checkpoint_dir=str(run_dir / "ckpt"),
        callbacks=[
            GenerateCallback(every_n_epochs=10),
            LatentScatterCallback(every_n_epochs=10),  # range = ball radius
            LatentInterpolationCallback(every_n_epochs=10),  # class-to-class geodesics
        ],
        use_mesh=args.use_mesh,
        **trainer_extra(args, model),
    )
    result = trainer.fit(dm)
    print(f"epochs={result.epochs_run} best {trainer.monitor}={result.best_metric:.4f} "
          f"samples/sec={result.samples_per_sec:.0f}")
    print("test:", trainer.evaluate(dm, result.best_params, "test"))
    return result


if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--latent-dim", type=int, default=2)
    parser.add_argument("--curvature", type=float, default=1.0)
    parser.add_argument("--beta", type=float, default=1.0)
    parser.add_argument("--prior-scale", type=float, default=1.0)
    parser.add_argument(
        "--seeds", type=int, nargs="+", default=None,
        help="multi-seed sweep: train ALL seeds at once via fit_ensemble",
    )
    parser.add_argument(
        "--seed-mesh", type=int, default=0,
        help="shard the --seeds lanes over this many devices "
        "(1-D 'seed' mesh, zero-collective sweep scale-out); 0 = off",
    )
    args = parser.parse_args()
    run_dir = setup(args, "vae_hyperbolic_mnist_gyroplane")
    if args.seeds:
        train_seed_sweep(args, run_dir, args.latent_dim)
    else:
        train_latent_dim(args, run_dir, args.latent_dim)
