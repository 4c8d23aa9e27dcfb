"""Experiment 2: Euclidean conv VAE on CIFAR-10 (latent 128).

Reference: /root/reference/scripts/_2_train_vae_euclidean_cifar10.py —
the canonical dataset -> datamodule -> model -> trainer pipeline (:1-19).
"""

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import cifar10
from hyperbolic_vae_tpu.models import EuclideanVAE
from hyperbolic_vae_tpu.train import GenerateCallback, LatentScatterCallback, Trainer

if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--latent-dim", type=int, default=128)
    parser.add_argument("--beta", type=float, default=1.0)
    args = parser.parse_args()
    run_dir = setup(args, "vae_euclidean_cifar10")
    dm = cifar10.make_data_module(
        batch_size=args.batch_size,
        data_dir=args.data_dir,
        synthetic=args.synthetic,
        n_train=args.n_train,
    )
    model = EuclideanVAE(
        data_shape=dm.input_shape, latent_dim=args.latent_dim, beta=args.beta, lr=args.lr
    )
    trainer = Trainer(
        model,
        lr=args.lr,
        max_epochs=args.epochs,
        seed=args.seed,
        early_stopping_patience=None if args.no_early_stopping else 10,
        log_dir=str(run_dir),
        checkpoint_dir=str(run_dir / "ckpt"),
        callbacks=[GenerateCallback(every_n_epochs=10), LatentScatterCallback(every_n_epochs=10)],
        use_mesh=args.use_mesh,
        **trainer_extra(args, model),
    )
    result = trainer.fit(dm)
    print("test:", trainer.evaluate(dm, result.best_params, "test"))
