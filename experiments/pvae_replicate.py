"""Experiment 9: pvae-replication grid — WrappedNormal vs
RiemannianNormal posteriors with IWAE evaluation.

Reference: /root/reference/scripts/_9_pvae_replicate.py records the
target config (784 -> 600 ReLU -> 2, batch 128, lr 5e-4, 80 epochs,
5000-sample IWAE eval; :5-30, :200-210) but is itself a SyntaxError
(:190-198). This is the runnable version, including the
RiemannianNormal path the reference never got working.
"""

import json

import jax
import jax.numpy as jnp

from common import base_parser, setup, trainer_extra

from hyperbolic_vae_tpu.data import mnist
from hyperbolic_vae_tpu.models import PvaeMLPVAE
from hyperbolic_vae_tpu.train import Trainer

# ---- the scientific target of the `_9` replication (VERDICT r4 #7):
# Mathieu et al., "Continuous Hierarchical Representations with Poincaré
# Variational Auto-Encoders", NeurIPS 2019 (arXiv:1901.06033) — the pvae
# codebase the reference forks (/root/reference/README.md:5). Their MNIST
# table reports test negative log-likelihood (IWAE-5000 bound, nats,
# LOWER better) on MNIST, 784 -> 600 -> d, batch 128, lr 5e-4, 80 epochs
# — exactly this script's protocol. PROVENANCE CAVEAT: this container has
# zero network egress, so the values below are transcribed from memory of
# the paper's table and marked approximate; verify against the published
# PDF before using as a formal bar. The d=2 pair (the paper's headline
# "hyperbolic helps at low dim" result, ~2-nat gap) is the anchor to
# trust most. The QUALITATIVE acceptance bar is exact regardless:
# P-VAE(c=1.4) beats the Euclidean N-VAE at d=2 by >= 1 nat, the gap
# shrinking as d grows.
MATHIEU_2019_NLL = {
    # latent_dim: {"n_vae": ..., "pvae_c1.4": ...}  (approx, nats)
    2: {"n_vae": 144.5, "pvae_c1.4": 142.5},
    5: {"n_vae": 114.7, "pvae_c1.4": 113.7},
    10: {"n_vae": 100.2, "pvae_c1.4": 99.7},
    20: {"n_vae": 97.6, "pvae_c1.4": 97.3},
}


def published_comparison(results: dict, iwae_k: int) -> dict:
    """Side-by-side of measured IWAE bounds vs the published P-VAE MNIST
    table for every (c=1.4, d) cell present in ``results``. Our iwae_*
    metric is log-likelihood (higher better); the paper reports NLL —
    measured_nll = -iwae. Only meaningful on REAL MNIST (--real-mnist):
    on synthetic data the comparison is emitted but flagged."""
    rows = []
    for tag, r in results.items():
        if "_c1.4_" not in tag or not tag.startswith("wrapped"):
            continue
        d = int(tag.rsplit("_d", 1)[1])
        pub = MATHIEU_2019_NLL.get(d)
        if pub is None:
            continue
        measured_nll = -float(r[f"iwae_{iwae_k}"])
        rows.append({
            "latent_dim": d,
            "measured_nll_iwae": measured_nll,
            "published_pvae_nll": pub["pvae_c1.4"],
            "published_nvae_nll": pub["n_vae"],
            "delta_vs_published_pvae": measured_nll - pub["pvae_c1.4"],
        })
    return {
        "protocol": "784->600->d, batch 128, lr 5e-4, 80 epochs, "
                    f"IWAE-{iwae_k}, Bernoulli likelihood, WrappedNormal "
                    "posterior, c=1.4",
        "source": "Mathieu et al. 2019 (arXiv:1901.06033), MNIST table; "
                  "values approximate (zero-egress transcription from "
                  "memory — verify against the PDF)",
        "acceptance": "expected |delta_vs_published_pvae| <~ 2 nats on "
                      "real MNIST at 80 epochs; qualitative bar: beats "
                      "published N-VAE NLL at d=2",
        "rows": sorted(rows, key=lambda r: r["latent_dim"]),
    }


def iwae_eval(model, params, dm, k: int, seed: int = 0, chunk: int = 256) -> float:
    """K-sample IWAE on the test split, chunked to bound memory."""
    vals = []
    x_test = dm.x_test
    n = (len(x_test) // chunk) * chunk
    f = jax.jit(
        lambda x, key: model.apply(
            {"params": params}, x, k, method="iwae", rngs={"sample": key}
        )
    )
    for i in range(0, n, chunk):
        key = jax.random.PRNGKey(seed + i)
        # iwae returns per-sample bounds (B,); equal-size chunks, so the
        # mean of chunk means equals the split mean
        vals.append(float(jnp.mean(f(jnp.asarray(x_test[i : i + chunk]), key))))
    return sum(vals) / max(len(vals), 1)


def iwae_eval_lanes(model_fn, sweep, lanes, dm, k: int, seed: int = 0,
                    chunk: int = 256) -> list:
    """K-sample IWAE for ALL lanes in one vmapped program per chunk
    (same chunk key path as iwae_eval, so lane results match per-cell
    sequential evaluation)."""
    import numpy as np

    hp_stack = {
        "manifold_curvature": jnp.asarray(
            [float(l["manifold_curvature"]) for l in lanes], jnp.float32
        )
    }
    best = jax.tree.map(lambda *xs: jnp.stack(xs), *[r.best_params for r in sweep])

    def one(p, hp, x, key):
        return model_fn(hp).apply(
            {"params": p}, x, k, method="iwae", rngs={"sample": key}
        )

    f = jax.jit(jax.vmap(one, in_axes=(0, 0, None, None)))
    x_test = dm.x_test
    n = (len(x_test) // chunk) * chunk
    vals = []
    for i in range(0, n, chunk):
        key = jax.random.PRNGKey(seed + i)
        vals.append(np.asarray(f(best, hp_stack, jnp.asarray(x_test[i : i + chunk]), key)))
    # (n_chunks, S, B) per-sample bounds -> per-lane means
    per_lane = np.mean(np.stack(vals, axis=0), axis=(0, 2))
    return [float(v) for v in per_lane]


def lane_sweep_replicate(args, run_dir, dm):
    """Curvature cells of each (posterior, latent_dim) group as vmapped
    lanes of one program (the per-cell sequential loop below re-pays a
    relay compile per curvature; lanes share one per group)."""
    seed_mesh = None
    if getattr(args, "seed_mesh", 0):
        from hyperbolic_vae_tpu.parallel import make_seed_mesh

        seed_mesh = make_seed_mesh(args.seed_mesh)
    results = {}
    for posterior in args.posteriors:
        for d in args.latent_dims:
            def model_fn(hp, _p=posterior, _d=d):
                return PvaeMLPVAE(
                    data_shape=dm.input_shape, latent_dim=_d,
                    manifold_curvature=hp["manifold_curvature"],
                    posterior=_p, lr=args.lr,
                )

            lanes = [
                {"manifold_curvature": c, "seed": args.seed}
                for c in args.curvatures
            ]
            group = f"{posterior}_d{d}"
            trainer = Trainer(
                model_fn(lanes[0]), lr=args.lr, max_epochs=args.epochs,
                seed=args.seed, hp_model_fn=model_fn,
                early_stopping_patience=None if args.no_early_stopping else 10,
                log_dir=str(run_dir / group),
                **trainer_extra(args),
            )
            sweep = trainer.fit_lane_sweep(dm, lanes, seed_mesh=seed_mesh)
            iwaes = iwae_eval_lanes(model_fn, sweep, lanes, dm, args.iwae_k)
            for lane, r, iwae in zip(lanes, sweep, iwaes):
                c = lane["manifold_curvature"]
                tag = f"{posterior}_c{c}_d{d}"
                results[tag] = {
                    "best_val": r.best_metric,
                    f"iwae_{args.iwae_k}": iwae,
                }
                print(tag, results[tag])
    return results


if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--posteriors", type=str, nargs="+", default=["wrapped", "riemannian"])
    parser.add_argument("--curvatures", type=float, nargs="+", default=[1.0])
    parser.add_argument("--latent-dims", type=int, nargs="+", default=[2])
    parser.add_argument("--iwae-k", type=int, default=5000)
    parser.add_argument(
        "--lane-sweep", action="store_true",
        help="train each (posterior, latent_dim) group's curvature cells "
        "as vmapped lanes of one compiled program",
    )
    parser.add_argument(
        "--seed-mesh", type=int, default=0,
        help="with --lane-sweep: shard the lanes over this many devices "
        "(1-D 'seed' mesh; len(curvatures) must divide it evenly); 0 = off",
    )
    parser.add_argument(
        "--real-mnist", type=str, default=None, metavar="IDX_DIR",
        help="directory holding the real MNIST IDX files; trains the grid "
        "on them and emits published_comparison.json — the side-by-side "
        "against Mathieu et al. 2019's MNIST table (the real-data "
        "acceptance bar; see MATHIEU_2019_NLL)",
    )
    parser.set_defaults(epochs=80, batch_size=128, lr=5e-4)
    args = parser.parse_args()
    if args.real_mnist:
        args.synthetic = False
        args.data_dir = args.real_mnist
    run_dir = setup(args, "pvae_replicate")
    dm = mnist.make_data_module(
        batch_size=args.batch_size, data_dir=args.data_dir,
        synthetic=args.synthetic, n_train=args.n_train,
    )

    def finish(out: dict) -> None:
        (run_dir / "replicate_results.json").write_text(json.dumps(out, indent=2))
        print(json.dumps(out, indent=2))
        cmp = published_comparison(out, args.iwae_k)
        if args.synthetic:
            cmp["warning"] = (
                "trained on SYNTHETIC data — deltas vs the published "
                "real-MNIST numbers are not meaningful; rerun with "
                "--real-mnist <idx-dir>"
            )
        if cmp["rows"]:
            (run_dir / "published_comparison.json").write_text(
                json.dumps(cmp, indent=2)
            )
            print(json.dumps(cmp, indent=2))

    if args.lane_sweep:
        if args.use_mesh:
            raise SystemExit("--use-mesh does not compose with --lane-sweep")
        results = lane_sweep_replicate(args, run_dir, dm)
        finish({k: {m: float(v) for m, v in r.items()} for k, r in results.items()})
        raise SystemExit(0)
    results = {}
    for posterior in args.posteriors:
        for c in args.curvatures:
            for d in args.latent_dims:
                tag = f"{posterior}_c{c}_d{d}"
                model = PvaeMLPVAE(
                    data_shape=dm.input_shape,
                    latent_dim=d,
                    manifold_curvature=c,
                    posterior=posterior,
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
                iwae = iwae_eval(model, result.best_params, dm, args.iwae_k)
                results[tag] = {
                    "best_val": result.best_metric,
                    f"iwae_{args.iwae_k}": iwae,
                }
                print(tag, results[tag])
    finish({k: {m: float(v) for m, v in r.items()} for k, r in results.items()})
