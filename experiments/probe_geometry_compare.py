"""Hyperbolic vs Euclidean latent space, quantified.

The reference's motivating claim (and the pvae paper's) is that
HIERARCHICAL data embeds better in hyperbolic space — but the reference
only ever shows it qualitatively (latent scatter figures). This
experiment makes it a number: train the SAME UnifiedVAE architecture on
the structured (9-cell-type hierarchical) synthetic RNA-seq data with a
Poincaré latent (curvature c) and with a Euclidean latent (c=0), then
compare latent-probe accuracies (probe.py: geodesic/Euclidean kNN +
nearest class mean) at equal latent dimension.

Usage (zero-egress container; structured fake data is seeded):
  python experiments/probe_geometry_compare.py --epochs 60 \
      --epochs-per-dispatch 20 --latent-dim 2
"""

import json
from pathlib import Path

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import jerby_arnon
from hyperbolic_vae_tpu.models import UnifiedVAE
from hyperbolic_vae_tpu.train import Trainer

if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--latent-dim", type=int, default=2)
    parser.add_argument("--curvature", type=float, default=1.0)
    parser.add_argument("--hidden-dim", type=int, default=100)
    parser.add_argument("--beta", type=float, default=0.5)
    parser.add_argument("--probe-k", type=int, default=10)
    parser.add_argument("--n-genes", type=int, default=2000)
    parser.add_argument("--n-samples", type=int, default=2000)
    args = parser.parse_args()
    setup(args, "probe_geometry_compare")
    run_dir = Path(args.run_dir or "runs/probe_geometry_compare")
    run_dir.mkdir(parents=True, exist_ok=True)

    dm = jerby_arnon.make_rnaseq_data_module(
        batch_size=args.batch_size,
        fake=True,
        structured_fake=True,  # hierarchical cell types — the case hyperbolic space is FOR
        n_samples=args.n_samples,
        n_genes=args.n_genes,
        seed=args.seed,
    )

    results = {}
    for name, curv in [("hyperbolic", args.curvature), ("euclidean", 0.0)]:
        model = UnifiedVAE(
            input_size=dm.input_shape,
            hidden_layer_dim=args.hidden_dim,
            latent_dim=args.latent_dim,
            latent_curvature=curv if curv else None,
            prior_scale=2.0,
            posterior_scale="learned",
            learning_rate=args.lr,
            beta=args.beta,
            kl_loss_method="logmap0_analytic",  # valid for BOTH geometries (mu_t = mu when flat)
            last_activation="sigmoid",
            loss_recon_method="MSE",
        )
        trainer = Trainer(
            model,
            lr=args.lr,
            max_epochs=args.epochs,
            seed=args.seed,
            early_stopping_patience=None if args.no_early_stopping else 10,
            log_dir=str(run_dir / name),
            **trainer_extra(args),
        )
        res = trainer.fit(dm)
        probes = trainer.evaluate_probe(dm, res.best_params, k=args.probe_k)
        results[name] = {
            "epochs": res.epochs_run,
            "best_val_loss_total": res.best_metric,
            **probes,
        }
        print(name, results[name])

    (run_dir / "probe_compare.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
