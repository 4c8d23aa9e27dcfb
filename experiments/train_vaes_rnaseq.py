"""Experiment 8: unified configurable VAE on Jerby-Arnon scRNA-seq (or
MNIST via --dataset mnist).

Reference: /root/reference/scripts/_8_train_vaes_rnaseq.py:88-130 —
z-score normalization, latent 2, c = 1.0, prior_scale 2.0, beta 0.5,
kl_loss_method = "logmap0_analytic", hidden 100. Uses the fake Poisson
dataset (jerby_arnon.py:199-219) when --fake or no --data-dir given.
"""

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import jerby_arnon, mnist
from hyperbolic_vae_tpu.models import UnifiedVAE
from hyperbolic_vae_tpu.train import GenerateCallback, LatentScatterCallback, Trainer

if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--dataset", type=str, default="rnaseq", choices=["rnaseq", "mnist"])
    parser.add_argument("--fake", action="store_true", help="seeded fake RNA-seq data")
    parser.add_argument("--structured-fake", action="store_true",
                        help="fake data with per-type marker-gene modules (latent figures)")
    parser.add_argument("--rnaseq-dir", type=str, default=None)
    parser.add_argument("--normalize", type=str, default="z_score")
    parser.add_argument("--latent-dim", type=int, default=2)
    parser.add_argument("--curvature", type=float, default=1.0)
    parser.add_argument("--prior-scale", type=float, default=2.0)
    parser.add_argument("--beta", type=float, default=0.5)
    parser.add_argument("--hidden-dim", type=int, default=100)
    parser.add_argument("--kl-method", type=str, default="logmap0_analytic")
    parser.add_argument("--recon", type=str, default="MSE")
    parser.add_argument("--last-activation", type=str, default="sigmoid")
    parser.add_argument("--tp", type=int, default=1, help="model-axis size (tensor parallelism over the wide layers)")
    parser.add_argument(
        "--fsdp", action="store_true",
        help="ZeRO-3-style sharding: params + Adam moments sharded over"
        " the data axis (composes with --tp for the 2-D weight layout)",
    )
    parser.add_argument(
        "--stream-block-rows", type=int, default=0,
        help="train with HOST-resident data streamed through the device in"
        " double-buffered blocks of this many rows (for splits larger than"
        " HBM; 0 = stage the whole split on device)",
    )
    parser.set_defaults(batch_size=64)
    args = parser.parse_args()
    run_dir = setup(args, "vaes_rnaseq")

    if args.dataset == "mnist":
        dm = mnist.make_data_module(
            batch_size=args.batch_size, data_dir=args.data_dir,
            synthetic=args.synthetic, n_train=args.n_train,
        )
        callbacks = [GenerateCallback(every_n_epochs=10), LatentScatterCallback(every_n_epochs=10)]
    else:
        dm = jerby_arnon.make_rnaseq_data_module(
            batch_size=args.batch_size,
            data_dir=args.rnaseq_dir,
            fake=args.fake or args.rnaseq_dir is None,
            rnaseq_normalize_method=args.normalize,
            structured_fake=args.structured_fake,
        )
        callbacks = [LatentScatterCallback(every_n_epochs=10)]

    # input shape is data-driven (ref _8:39)
    model = UnifiedVAE(
        input_size=dm.input_shape,
        hidden_layer_dim=args.hidden_dim,
        latent_dim=args.latent_dim,
        latent_curvature=args.curvature if args.curvature else None,
        prior_scale=args.prior_scale,
        posterior_scale="learned",
        learning_rate=args.lr,
        beta=args.beta,
        kl_loss_method=args.kl_method,
        last_activation=args.last_activation,
        loss_recon_method=args.recon,
    )
    mesh = None
    param_sharding_fn = None
    if args.tp > 1 or args.fsdp:
        from hyperbolic_vae_tpu.parallel import make_mesh
        from hyperbolic_vae_tpu.parallel.sharding_rules import (
            fsdp_param_shardings,
            fsdp_tp_param_shardings,
            tp_param_shardings,
        )

        import jax

        mesh = make_mesh(n_data=max(len(jax.devices()) // args.tp, 1), n_model=args.tp)
        if args.fsdp and args.tp > 1:
            param_sharding_fn = fsdp_tp_param_shardings
        elif args.fsdp:
            param_sharding_fn = fsdp_param_shardings
        else:
            param_sharding_fn = tp_param_shardings
    trainer = Trainer(
        model,
        lr=args.lr,
        max_epochs=args.epochs,
        seed=args.seed,
        early_stopping_patience=None if args.no_early_stopping else 10,
        log_dir=str(run_dir),
        checkpoint_dir=str(run_dir / "ckpt"),
        callbacks=callbacks,
        use_mesh=args.use_mesh and mesh is None,
        mesh=mesh,
        param_sharding_fn=param_sharding_fn,
        **trainer_extra(args, model),
    )
    if args.stream_block_rows:
        result = trainer.fit_streamed(dm, block_rows=args.stream_block_rows)
    else:
        result = trainer.fit(dm)
    print("test:", trainer.evaluate(dm, result.best_params, "test"))
