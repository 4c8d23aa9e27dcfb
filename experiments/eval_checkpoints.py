"""Evaluate saved checkpoints on the MNIST test split.

The runnable version of the reference's stub /root/reference/scripts/
_5_eval_on_mnist_test.py (its body is commented out, :8-24): glob run
directories for checkpoints, restore, report test metrics per run.
"""

import json
from pathlib import Path

from common import base_parser, setup

from hyperbolic_vae_tpu.data import mnist
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import Trainer
from hyperbolic_vae_tpu.train.checkpoint import CheckpointManager

if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--glob", type=str, default="runs/*/ckpt", help="checkpoint dir glob")
    parser.add_argument("--latent-dim", type=int, default=2)
    parser.add_argument("--curvature", type=float, default=1.0)
    args = parser.parse_args()
    setup(args, "eval_checkpoints")
    dm = mnist.make_data_module(
        batch_size=args.batch_size, data_dir=args.data_dir,
        synthetic=args.synthetic, n_train=args.n_train,
    )
    model = GyroplaneVAE(
        data_shape=dm.input_shape, latent_dim=args.latent_dim,
        manifold_curvature=args.curvature,
    )
    trainer = Trainer(model, max_epochs=1)
    template = trainer.init_params(dm.x_train)
    results = {}
    for ckpt_dir in sorted(Path(".").glob(args.glob)):
        mgr = CheckpointManager(str(ckpt_dir))
        if mgr.best_metadata() is None:
            continue
        params = mgr.restore("best", like=template)
        results[str(ckpt_dir)] = trainer.evaluate(dm, params, "test")
        print(ckpt_dir, results[str(ckpt_dir)])
    print(json.dumps(results, indent=2))
