"""Experiment 5: conv hyperbolic VAE on MNIST — Mobius encoder +
gyroplane decoder, curvature 1.4, MSE; fit -> load best -> test.

Reference: /root/reference/scripts/_5_train_vae_hyperbolic_mnist.py:19-52.
"""

import numpy as np

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import mnist
from hyperbolic_vae_tpu.models import HyperbolicImageVAE
from hyperbolic_vae_tpu.train import GenerateCallback, LatentScatterCallback, Trainer
from train_vae_euclidean_mnist import pad_to_32

if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--latent-dim", type=int, default=2)
    parser.add_argument("--curvature", type=float, default=1.4)
    parser.add_argument("--beta", type=float, default=1.0)
    parser.add_argument("--encoder-last", type=str, default="mobius")
    parser.add_argument("--decoder-first", type=str, default="geoopt_gyroplane")
    parser.add_argument("--loss-recon", type=str, default="mse")
    args = parser.parse_args()
    run_dir = setup(args, "vae_hyperbolic_mnist")
    dm = pad_to_32(
        mnist.make_data_module(
            batch_size=args.batch_size,
            data_dir=args.data_dir,
            synthetic=args.synthetic,
            n_train=args.n_train,
        )
    )
    model = HyperbolicImageVAE(
        data_shape=dm.input_shape,
        latent_dim=args.latent_dim,
        manifold_curvature=args.curvature,
        encoder_last_layer_module=args.encoder_last,
        decoder_first_layer_module=args.decoder_first,
        beta=args.beta,
        lr=args.lr,
        loss_recon=args.loss_recon,
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
            # plot range = ball radius c^-0.5 (ref trainer_mnist.py:31-33)
            LatentScatterCallback(every_n_epochs=10),
        ],
        use_mesh=args.use_mesh,
        **trainer_extra(args, model),
    )
    result = trainer.fit(dm)
    best = trainer._ckpt_mgr.restore("best", like=result.params)
    print("test:", trainer.evaluate(dm, best, "test"))
