"""Import a reference (torch/Lightning/geoopt) checkpoint into this
framework: torch state_dict -> flax params -> self-describing Orbax
checkpoint directory that every downstream tool understands
(eval_checkpoints.py, export_serving_bundle.py, serve_http, fine-tuning
via Trainer(resume=...) after a fit).

    python experiments/import_torch_checkpoint.py epoch=99.ckpt --out runs/imported
    python experiments/import_torch_checkpoint.py weights.npz --model rnaseq \
        --out runs/imported_rnaseq

The model family and its constructor hyperparameters are auto-detected
from the state_dict key layout and weight shapes (plus Lightning's
embedded ``hyper_parameters`` when present); any flag overrides the
detection. See hyperbolic_vae_tpu/interop/torch_import.py for the
supported reference classes and the exact weight-layout transforms.
"""

from __future__ import annotations

import argparse
import math
import os
from pathlib import Path

from common import REPO_ROOT  # noqa: F401 (import fixes sys.path)

from hyperbolic_vae_tpu.interop import import_torch_state_dict, load_torch_state_dict


def load_lightning_hparams(path: Path, allow_unsafe_pickle: bool = False) -> dict:
    """Lightning embeds save_hyperparameters() output in the .ckpt
    (reference vae_hyperbolic.py:145-153); .npz exports don't have it.
    Full-pickle loading (which executes code embedded in the file) is
    opt-in via ``allow_unsafe_pickle`` — same policy as
    interop.load_torch_state_dict."""
    if path.suffix == ".npz":
        return {}
    try:
        import torch

        try:
            raw = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            if not allow_unsafe_pickle:
                return {}
            raw = torch.load(path, map_location="cpu", weights_only=False)
        hp = raw.get("hyper_parameters", {}) if isinstance(raw, dict) else {}
        return {k: v for k, v in hp.items() if isinstance(v, (int, float, str, bool, list, tuple))}
    except Exception:
        return {}


def _square_image_shape(numel: int, channels: int = 1):
    side = int(math.isqrt(numel // channels))
    if side * side * channels != numel:
        raise ValueError(
            f"cannot infer a square image shape from {numel} features; "
            "pass --data-shape H W C"
        )
    return (side, side, channels)


def detect_family(sd: dict) -> str:
    if any(k.startswith("encoder.net.") for k in sd):
        return "autoencoder"
    if "encoder.0.weight" in sd and sd["encoder.0.weight"].ndim == 4:
        return "euclidean" if "encoder.6.weight" in sd else "hyperbolic-image"
    n_enc_linear = sum(
        1 for k in sd if k.startswith("encoder.") and k.endswith(".weight")
    )
    return "gyroplane" if n_enc_linear == 2 else "unified"


def build_model(family: str, sd: dict, hp: dict, args):
    """The target flax model whose constructor matches the weights."""
    from hyperbolic_vae_tpu.models import (
        Autoencoder,
        EuclideanVAE,
        GyroplaneVAE,
        HyperbolicImageVAE,
        RNASeqVAE,
        UnifiedVAE,
    )

    c = args.curvature if args.curvature is not None else float(
        hp.get("manifold_curvature", hp.get("latent_curvature", 1.0)) or 1.0
    )
    beta = args.beta if args.beta is not None else float(hp.get("beta", 1.0))

    def data_shape(numel, channels=1):
        if args.data_shape:
            return tuple(args.data_shape)
        if "data_shape" in hp:  # reference stores torch CHW
            chw = tuple(hp["data_shape"])
            return (chw[1], chw[2], chw[0]) if len(chw) == 3 else tuple(chw)
        return _square_image_shape(numel, channels)

    if family == "gyroplane":
        enc_keys = sorted(
            (int(k.split(".")[1]), k) for k in sd
            if k.startswith("encoder.") and k.endswith(".weight")
        )
        numel = sd[enc_keys[0][1]].shape[1]
        hidden = tuple(sd[k].shape[0] for _, k in enc_keys)
        return GyroplaneVAE(
            data_shape=data_shape(numel),
            latent_dim=sd["mu.0.weight"].shape[0],
            manifold_curvature=c,
            beta=beta,
            prior_scale=float(hp.get("prior_scale", 1.0)),
            hidden_dims=hidden,
        )
    if family in ("unified", "rnaseq"):
        enc_key = next(
            k for k in sd if k.startswith("encoder.") and k.endswith(".weight")
        )
        features = sd[enc_key].shape[1]
        hidden = sd[enc_key].shape[0]
        latent = sd["mu.0.weight"].shape[0]
        if family == "rnaseq":
            return RNASeqVAE(
                in_features=features, hidden_dim=hidden, latent_dim=latent,
                manifold_curvature=c, beta=beta,
            )
        return UnifiedVAE(
            input_size=(features,), hidden_layer_dim=hidden, latent_dim=latent,
            latent_curvature=(c if "decoder.0.points" in sd else None),
            beta=beta,
        )
    if family == "euclidean":
        c_hid = sd["encoder.0.weight"].shape[0]
        ch = sd["encoder.0.weight"].shape[1]
        feat = sd["mu.weight"].shape[1]
        h8 = int(math.isqrt(feat // (2 * c_hid)))
        return EuclideanVAE(
            data_shape=args.data_shape or (8 * h8, 8 * h8, ch),
            hidden_size=c_hid, latent_dim=sd["mu.weight"].shape[0], beta=beta,
        )
    if family == "autoencoder":
        c_hid = sd["encoder.net.0.weight"].shape[0]
        ch = sd["encoder.net.0.weight"].shape[1]
        feat = sd["encoder.net.11.weight"].shape[1]
        h8 = int(math.isqrt(feat // (2 * c_hid)))
        return Autoencoder(
            data_shape=args.data_shape or (8 * h8, 8 * h8, ch),
            base_channel_size=c_hid,
            latent_dim=sd["encoder.net.11.weight"].shape[0],
        )
    if family == "hyperbolic-image":
        feat = sd["log_var.weight"].shape[1]
        h8 = int(math.isqrt(feat // 32))
        ch = sd["encoder.0.weight"].shape[1]
        enc_last = "linear" if "mu.weight" in sd else "mobius"
        if "decoder.0.points" in sd:
            dec_first = "geoopt_gyroplane"
        elif "decoder.0.weight" in sd:
            dec_first = "linear"
        else:
            dec_first = args.decoder_first or hp.get("decoder_first_layer_module")
            if dec_first not in ("geodesic", "mobius"):
                raise SystemExit(
                    "decoder.0 is a RiemannianLayer — geodesic and mobius "
                    "share the same state_dict layout; pass --decoder-first"
                )
        return HyperbolicImageVAE(
            data_shape=args.data_shape or (8 * h8, 8 * h8, ch),
            latent_dim=sd["log_var.weight"].shape[0],
            manifold_curvature=c,
            encoder_last_layer_module=enc_last,
            decoder_first_layer_module=dec_first,
            beta=beta,
            loss_recon=str(hp.get("loss_recon", args.loss_recon)),
        )
    raise SystemExit(f"unknown --model {family!r}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", type=str, help=".ckpt / .pt / .npz source")
    p.add_argument("--out", type=str, required=True, help="output checkpoint dir")
    p.add_argument(
        "--model", type=str, default=None,
        choices=["gyroplane", "unified", "rnaseq", "euclidean", "autoencoder",
                 "hyperbolic-image"],
        help="target family (default: detect from the state_dict layout); "
        "'rnaseq' targets RNASeqVAE for a vae_one_b-layout checkpoint",
    )
    p.add_argument("--name", type=str, default="best",
                   help="checkpoint name inside --out (default 'best' so "
                   "eval/serve tooling picks it up directly)")
    p.add_argument("--data-shape", type=int, nargs=3, default=None,
                   metavar=("H", "W", "C"))
    p.add_argument("--curvature", type=float, default=None)
    p.add_argument("--beta", type=float, default=None)
    p.add_argument("--decoder-first", type=str, default=None,
                   choices=["geodesic", "mobius"])
    p.add_argument("--loss-recon", type=str, default="mse",
                   choices=["mse", "bernoulli"])
    p.add_argument("--log-level", type=str, default="INFO")
    p.add_argument(
        "--allow-unsafe-pickle", action="store_true",
        help="permit full-pickle torch.load for ckpts the weights-only "
        "unpickler rejects (EXECUTES code embedded in the file — only "
        "for checkpoints you produced yourself)",
    )
    args = p.parse_args()

    if os.environ.get("HVAE_FORCE_CPU"):
        # the axon sitecustomize overrides JAX_PLATFORMS; config wins
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hyperbolic_vae_tpu.utils import configure_handler_for_script

    configure_handler_for_script(args.log_level)

    src = Path(args.checkpoint)
    sd = load_torch_state_dict(src, allow_unsafe_pickle=args.allow_unsafe_pickle)
    hp = load_lightning_hparams(src, allow_unsafe_pickle=args.allow_unsafe_pickle)
    family = args.model or detect_family(sd)
    model = build_model(family, sd, hp, args)
    params = import_torch_state_dict(model, sd)

    from hyperbolic_vae_tpu.train.checkpoint import CheckpointManager, model_hparams

    mgr = CheckpointManager(args.out)
    mgr.model_config = model_hparams(model)
    mgr.save_named(args.name, params, {"imported_from": str(src), "epoch": -1})
    mgr.wait_until_finished()

    import jax

    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"imported {type(model).__name__} ({n:,} params) from {src}")
    print(f"-> {args.out}/{args.name}  (restore_model('{args.out}', '{args.name}'))")


if __name__ == "__main__":
    main()
