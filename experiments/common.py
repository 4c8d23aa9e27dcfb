"""Shared experiment plumbing: CLI args, logging, run dirs.

The reference hard-codes hyperparameters per script (SURVEY section 5.6);
here each experiment keeps one runnable module (same UX) but with a
typed CLI for overrides, and a ``--synthetic`` flag because this
container has no network egress for dataset downloads.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from hyperbolic_vae_tpu.utils import RUNS_PATH, configure_handler_for_script  # noqa: E402


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--synthetic", action="store_true", help="use seeded synthetic data (no downloads)")
    p.add_argument("--n-train", type=int, default=60000, help="synthetic train size")
    p.add_argument("--run-dir", type=str, default=None)
    p.add_argument("--no-early-stopping", action="store_true")
    p.add_argument(
        "--epochs-per-dispatch", type=int, default=1,
        help="K>1: run K epochs per device dispatch (amortizes per-epoch"
        " host round trips; early-stop/LR-plateau run in-graph with exact"
        " per-epoch K=1 semantics)",
    )
    p.add_argument("--use-mesh", action="store_true", help="shard over all local devices")
    p.add_argument(
        "--moment-dtype", type=str, default=None, choices=[None, "bfloat16", "float32"],
        help="Adam moment STORAGE dtype (optimizer math stays f32);"
        " bfloat16 halves the moment HBM stream while keeping f32 master"
        " weights — see BASELINE.md's RNA-seq roofline",
    )
    p.add_argument(
        "--lr-schedule", type=str, default=None,
        choices=[None, "cosine", "exponential"],
        help="deterministic epoch-indexed LR schedule (replaces plateau"
        " control; optim/schedules.py). cosine: warmup + cosine decay to"
        " lr/100 at --epochs; exponential: gamma 0.97/epoch",
    )
    p.add_argument(
        "--warmup-epochs", type=int, default=0,
        help="linear LR warmup epochs for --lr-schedule",
    )
    p.add_argument(
        "--beta-warmup-epochs", type=int, default=0,
        help="KL annealing: ramp the model's beta linearly from 0 to its"
        " configured value over this many epochs (in-graph for chunked"
        " fits; optim/schedules.beta_warmup_schedule) — the standard cure"
        " for the posterior collapse the reference's constant-beta"
        " headline figures exhibit (figures/README.md)",
    )
    p.add_argument(
        "--grad-accum", type=int, default=1,
        help="A>1: accumulate gradients over A microbatches per optimizer"
        " step (effective batch stays --batch-size; activation memory"
        " drops to batch/A — for configs whose full batch of activations"
        " exceeds HBM)",
    )
    p.add_argument(
        "--grad-clip-norm", type=float, default=None,
        help="clip gradients to this global L2 norm before the optimizer"
        " (torch clip_grad_norm_ semantics)",
    )
    p.add_argument(
        "--ema-decay", type=float, default=None,
        help="track a parameter EMA (Polyak averaging) in the optimizer"
        " state; manifold leaves average in the tangent space at the"
        " origin (stays on the ball). Final EMA saved as the 'ema'"
        " checkpoint / returned as result.ema_params",
    )
    p.add_argument("--log-level", type=str, default="INFO")
    return p


def setup(args, name: str) -> Path:
    if os.environ.get("HVAE_FORCE_CPU"):
        # the axon sitecustomize overrides JAX_PLATFORMS; config wins
        import jax

        jax.config.update("jax_platforms", "cpu")
    configure_handler_for_script(args.log_level)
    run_dir = Path(args.run_dir) if args.run_dir else RUNS_PATH / name
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def trainer_extra(args, model=None) -> dict:
    """Trainer kwargs driven by common CLI flags (experiments splat this
    into their Trainer(...) call). Pass the constructed ``model`` so
    --beta-warmup-epochs can ramp to ITS configured beta."""
    extra = {
        "epochs_per_dispatch": getattr(args, "epochs_per_dispatch", 1),
        "moment_dtype": getattr(args, "moment_dtype", None),
        "ema_decay": getattr(args, "ema_decay", None),
        "grad_accum_steps": getattr(args, "grad_accum", 1),
        "grad_clip_norm": getattr(args, "grad_clip_norm", None),
    }
    beta_warmup = getattr(args, "beta_warmup_epochs", 0)
    if beta_warmup:
        if model is None or not hasattr(model, "beta"):
            raise SystemExit(
                "--beta-warmup-epochs needs a model with a beta attribute "
                "(this experiment does not pass its model to trainer_extra)"
            )
        from hyperbolic_vae_tpu.optim.schedules import beta_warmup_schedule

        extra["beta_schedule"] = beta_warmup_schedule(
            float(model.beta), warmup_epochs=beta_warmup
        )
    name = getattr(args, "lr_schedule", None)
    if name == "cosine":
        from hyperbolic_vae_tpu.optim.schedules import cosine_schedule

        extra["lr_schedule"] = cosine_schedule(
            args.lr, args.epochs, warmup_epochs=args.warmup_epochs,
            min_lr=args.lr / 100.0,
        )
    elif name == "exponential":
        from hyperbolic_vae_tpu.optim.schedules import exponential_schedule

        extra["lr_schedule"] = exponential_schedule(
            args.lr, gamma=0.97, warmup_epochs=args.warmup_epochs,
        )
    return extra
