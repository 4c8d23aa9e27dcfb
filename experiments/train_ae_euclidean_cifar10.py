"""Experiment 1: plain conv AE on CIFAR-10 with a latent-dim sweep.

Reference: /root/reference/scripts/_1_train_ae_euclidean_cifar10.py —
latent sweep [64, 128, 256, 384], pretrained-checkpoint short-circuit
(:31-37), val+test eval (:39-41).
"""

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import cifar10
from hyperbolic_vae_tpu.models import Autoencoder
from hyperbolic_vae_tpu.train import GenerateCallback, Trainer
from hyperbolic_vae_tpu.train.checkpoint import CheckpointManager


def train_cifar(args, run_dir, latent_dim: int) -> dict:
    dm = cifar10.make_data_module(
        batch_size=args.batch_size,
        data_dir=args.data_dir,
        synthetic=args.synthetic,
        n_train=args.n_train,
    )
    model = Autoencoder(data_shape=dm.input_shape, latent_dim=latent_dim, lr=args.lr)
    ckpt_dir = run_dir / f"latent_{latent_dim}" / "ckpt"
    trainer = Trainer(
        model,
        lr=args.lr,
        max_epochs=args.epochs,
        seed=args.seed,
        monitor="val/loss_total",
        early_stopping_patience=None if args.no_early_stopping else 10,
        log_dir=str(run_dir / f"latent_{latent_dim}"),
        checkpoint_dir=str(ckpt_dir),
        callbacks=[GenerateCallback(every_n_epochs=10)],
        use_mesh=args.use_mesh,
        **trainer_extra(args),
    )
    # pretrained short-circuit (ref :31-37)
    mgr = CheckpointManager(str(ckpt_dir))
    if mgr.best_metadata() is not None:
        params = trainer.init_params(dm.x_train)
        params = mgr.restore("best", like=params)
        result_params = params
    else:
        result = trainer.fit(dm)
        result_params = result.best_params
    val = trainer.evaluate(dm, result_params, "val")
    test = trainer.evaluate(dm, result_params, "test")
    print({"latent_dim": latent_dim, "val": val, "test": test})
    return {"val": val, "test": test}


if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--latent-dims", type=int, nargs="+", default=[64, 128, 256, 384])
    args = parser.parse_args()
    run_dir = setup(args, "ae_euclidean_cifar10")
    for latent_dim in args.latent_dims:
        train_cifar(args, run_dir, latent_dim)
