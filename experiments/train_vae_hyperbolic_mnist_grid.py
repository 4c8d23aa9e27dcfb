"""Experiment 7: grid sweep over curvature x beta x latent-dim x layer
choices with per-run crash isolation.

Reference: /root/reference/scripts/_7_train_vae_hyperbolic_mnist_grid.py
(try/except-traceback-continue per run, :75-89).
"""

import itertools
import json
import traceback

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import mnist
from hyperbolic_vae_tpu.models import HyperbolicImageVAE
from hyperbolic_vae_tpu.train import Trainer
from train_vae_euclidean_mnist import pad_to_32

if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--curvatures", type=float, nargs="+", default=[0.5, 1.0, 1.4])
    parser.add_argument("--betas", type=float, nargs="+", default=[1.0, 3.0])
    parser.add_argument("--latent-dims", type=int, nargs="+", default=[2])
    parser.add_argument("--encoder-lasts", type=str, nargs="+", default=["linear", "mobius"])
    parser.add_argument("--decoder-firsts", type=str, nargs="+", default=["geoopt_gyroplane", "geodesic"])
    args = parser.parse_args()
    run_dir = setup(args, "vae_hyperbolic_mnist_grid")
    dm = pad_to_32(
        mnist.make_data_module(
            batch_size=args.batch_size,
            data_dir=args.data_dir,
            synthetic=args.synthetic,
            n_train=args.n_train,
        )
    )
    results = {}
    grid = itertools.product(
        args.curvatures, args.betas, args.latent_dims, args.encoder_lasts, args.decoder_firsts
    )
    for c, beta, latent_dim, enc, dec in grid:
        tag = f"c{c}_b{beta}_d{latent_dim}_{enc}_{dec}"
        try:
            model = HyperbolicImageVAE(
                data_shape=dm.input_shape,
                latent_dim=latent_dim,
                manifold_curvature=c,
                encoder_last_layer_module=enc,
                decoder_first_layer_module=dec,
                beta=beta,
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
            test = trainer.evaluate(dm, result.best_params, "test")
            results[tag] = test
            print(tag, test)
        except Exception:  # per-run isolation (ref :75-89)
            traceback.print_exc()
            results[tag] = None
    out = {k: ({m: float(v) for m, v in r.items()} if r else None) for k, r in results.items()}
    (run_dir / "grid_results.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
