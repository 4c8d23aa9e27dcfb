"""Experiment 3: Euclidean conv VAE on MNIST, 2-D latent — the Euclidean
baseline for the latent-space figures.

Reference: /root/reference/scripts/_3_train_vae_euclidean_mnist.py.
MNIST is padded 28 -> 32 for the stride-8 conv stack (the reference
declares (1, 32, 32) while feeding 28x28 — SURVEY section 2.5; here the
padding is explicit).
"""

import numpy as np

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import mnist
from hyperbolic_vae_tpu.models import EuclideanVAE
from hyperbolic_vae_tpu.train import GenerateCallback, LatentScatterCallback, Trainer


def pad_to_32(dm):
    for s in ("train", "val", "test"):
        x = getattr(dm, f"x_{s}")
        setattr(dm, f"x_{s}", np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0))))
    return dm


if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--latent-dim", type=int, default=2)
    parser.add_argument("--beta", type=float, default=1.0)
    args = parser.parse_args()
    run_dir = setup(args, "vae_euclidean_mnist")
    dm = pad_to_32(
        mnist.make_data_module(
            batch_size=args.batch_size,
            data_dir=args.data_dir,
            synthetic=args.synthetic,
            n_train=args.n_train,
        )
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
        callbacks=[
            GenerateCallback(every_n_epochs=10),
            LatentScatterCallback(every_n_epochs=10, range_xy=4.0),
        ],
        use_mesh=args.use_mesh,
        **trainer_extra(args, model),
    )
    result = trainer.fit(dm)
    print("test:", trainer.evaluate(dm, result.best_params, "test"))
