"""Experiment 7: grid sweep over curvature x beta x latent-dim x layer
choices with per-run crash isolation.

Reference: /root/reference/scripts/_7_train_vae_hyperbolic_mnist_grid.py
(try/except-traceback-continue per run, :75-89).

``--lane-sweep``: instead of one sequential fit per cell (the
reference's loop), the (curvature x beta) cells of each shape group
(same latent dim + layer choices) train as vmapped LANES of one
compiled program (Trainer(hp_model_fn=...) + fit_lane_sweep) — the
grid runs as len(latent_dims x enc x dec) programs instead of
len(full grid) fits.
"""

import itertools
import json
import time
import traceback

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import mnist
from hyperbolic_vae_tpu.models import HyperbolicImageVAE
from hyperbolic_vae_tpu.train import Trainer
from train_vae_euclidean_mnist import pad_to_32


def lane_sweep_grid(args, run_dir, dm):
    """One fit_lane_sweep per (latent_dim, enc, dec) shape group."""
    from hyperbolic_vae_tpu.train.ensemble import evaluate_lanes

    if args.use_mesh:
        raise SystemExit(
            "--use-mesh (data parallelism) does not compose with "
            "--lane-sweep; shard the lanes themselves with --seed-mesh N"
        )
    seed_mesh = None
    if args.seed_mesh:
        from hyperbolic_vae_tpu.parallel import make_seed_mesh

        seed_mesh = make_seed_mesh(args.seed_mesh)
    results = {}
    for latent_dim, enc, dec in itertools.product(
        args.latent_dims, args.encoder_lasts, args.decoder_firsts
    ):
        def model_fn(hp, _d=latent_dim, _e=enc, _x=dec):
            return HyperbolicImageVAE(
                data_shape=dm.input_shape, latent_dim=_d,
                manifold_curvature=hp["manifold_curvature"],
                encoder_last_layer_module=_e, decoder_first_layer_module=_x,
                beta=hp["beta"], lr=args.lr,
            )

        lanes = [
            {"manifold_curvature": c, "beta": b, "seed": args.seed}
            for c, b in itertools.product(args.curvatures, args.betas)
        ]
        group = f"d{latent_dim}_{enc}_{dec}"
        try:
            rep = model_fn(lanes[0])
            trainer = Trainer(
                rep, lr=args.lr, max_epochs=args.epochs, seed=args.seed,
                hp_model_fn=model_fn,
                early_stopping_patience=None if args.no_early_stopping else 10,
                log_dir=str(run_dir / group),
                **trainer_extra(args),
            )
            t0 = time.perf_counter()
            sweep = trainer.fit_lane_sweep(dm, lanes, seed_mesh=seed_mesh)
            # ONE vmapped eval program for the whole group (a concrete
            # Trainer.evaluate per cell would re-pay a relay compile per
            # cell — the cost lanes exist to remove)
            tests = evaluate_lanes(trainer, dm, sweep, lanes, "test")
            wall = time.perf_counter() - t0
            for lane, r, test in zip(lanes, sweep, tests):
                tag = f"c{lane['manifold_curvature']}_b{lane['beta']}_{group}"
                results[tag] = dict(test, epochs=r.epochs_run,
                                    best_val=r.best_metric)
                print(tag, results[tag])
            print(f"[{group}] {len(lanes)} lanes in ONE program: "
                  f"{wall:.1f}s wall, {sweep[0].samples_per_sec:.0f} agg samples/s")
        except Exception:  # per-group isolation (ref :75-89)
            traceback.print_exc()
            for c, b in itertools.product(args.curvatures, args.betas):
                results[f"c{c}_b{b}_{group}"] = None
    return results


if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--curvatures", type=float, nargs="+", default=[0.5, 1.0, 1.4])
    parser.add_argument("--betas", type=float, nargs="+", default=[1.0, 3.0])
    parser.add_argument("--latent-dims", type=int, nargs="+", default=[2])
    parser.add_argument("--encoder-lasts", type=str, nargs="+", default=["linear", "mobius"])
    parser.add_argument("--decoder-firsts", type=str, nargs="+", default=["geoopt_gyroplane", "geodesic"])
    parser.add_argument(
        "--lane-sweep", action="store_true",
        help="train each shape group's (curvature x beta) cells as vmapped "
        "lanes of one compiled program instead of sequential fits",
    )
    parser.add_argument(
        "--seed-mesh", type=int, default=0,
        help="with --lane-sweep: shard the lanes over this many devices "
        "(1-D 'seed' mesh); 0 = off",
    )
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
    if args.lane_sweep:
        results = lane_sweep_grid(args, run_dir, dm)
        out = {
            k: ({m: float(v) for m, v in r.items()} if r else None)
            for k, r in results.items()
        }
        (run_dir / "grid_results.json").write_text(json.dumps(out, indent=2))
        print(json.dumps(out, indent=2))
        raise SystemExit(0)

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
