"""Evaluate saved checkpoints on a test split — model-agnostic.

The runnable version of the reference's stub /root/reference/scripts/
_5_eval_on_mnist_test.py (its body is commented out, :8-24), built on
self-describing checkpoints: every Trainer checkpoint embeds the model's
class + constructor hparams (Lightning ``save_hyperparameters`` parity,
/root/reference/hyperbolic_vae/models/vae_hyperbolic.py:145-153), so one
eval command restores ANY model family via ``restore_model`` — no
hard-coded architecture flags.
"""

import glob as globlib
import json
from pathlib import Path

from common import base_parser, setup

from hyperbolic_vae_tpu.train import Trainer
from hyperbolic_vae_tpu.train.checkpoint import restore_model


def data_module_for(model, args):
    """Pick the dataset family from the restored model's input signature."""
    in_features = getattr(model, "in_features", None)
    data_shape = tuple(
        getattr(model, "data_shape", None)
        or getattr(model, "input_size", None)
        or (in_features,)
    )
    if len(data_shape) == 1 and data_shape[0] != 784:
        # flat gene-expression vector -> RNA-seq family
        from hyperbolic_vae_tpu.data.jerby_arnon import make_rnaseq_data_module

        return make_rnaseq_data_module(
            batch_size=args.batch_size, fake=args.synthetic,
            n_genes=data_shape[0], data_dir=args.data_dir,
        )
    if data_shape == (32, 32, 3):
        from hyperbolic_vae_tpu.data import cifar10

        return cifar10.make_data_module(
            batch_size=args.batch_size, data_dir=args.data_dir,
            synthetic=args.synthetic, n_train=args.n_train,
        )
    if data_shape == (32, 32, 1):
        # the conv MNIST families train on pad-to-32 MNIST (the _5
        # protocol) — routing by (32, 32) alone sent them to 3-channel
        # CIFAR and crashed restore-time eval
        from train_vae_euclidean_mnist import pad_to_32

        from hyperbolic_vae_tpu.data import mnist

        return pad_to_32(mnist.make_data_module(
            batch_size=args.batch_size, data_dir=args.data_dir,
            synthetic=args.synthetic, n_train=args.n_train,
        ))
    from hyperbolic_vae_tpu.data import mnist

    return mnist.make_data_module(
        batch_size=args.batch_size, data_dir=args.data_dir,
        synthetic=args.synthetic, n_train=args.n_train,
    )


if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--glob", type=str, default="runs/*/ckpt", help="checkpoint dir glob")
    parser.add_argument("--which", type=str, default="best", choices=["best", "last", "ema"])
    parser.add_argument(
        "--iwae", type=int, default=0, metavar="K",
        help="also report the K-importance-weighted log p(x) bound "
             "(test/iwae_K; the reference's unimplemented follow-up, "
             "vae_hyperbolic_gyroplane_decoder.py:37-40)",
    )
    parser.add_argument(
        "--probe", type=int, default=0, metavar="K",
        help="also report latent-space probe accuracies (K-NN + nearest "
             "Fréchet mean under the latent metric, probe.py)",
    )
    args = parser.parse_args()
    setup(args, "eval_checkpoints")
    results = {}
    for ckpt_dir in sorted(Path(p) for p in globlib.glob(args.glob)):
        try:
            model, params, meta = restore_model(str(ckpt_dir), args.which)
        except (ValueError, FileNotFoundError) as e:
            print(f"skip {ckpt_dir}: {e}")
            continue
        dm = data_module_for(model, args)
        trainer = Trainer(model, max_epochs=1)
        metrics = trainer.evaluate(dm, params, "test")
        if args.iwae:
            try:
                metrics[f"test/iwae_{args.iwae}"] = trainer.evaluate_iwae(
                    dm, params, k=args.iwae
                )
            except Exception as e:  # families without iwae stay evaluable
                print(f"iwae unavailable for {ckpt_dir}: {e}")
        if args.probe:
            try:
                metrics.update(trainer.evaluate_probe(dm, params, k=args.probe))
            except Exception as e:
                print(f"probe unavailable for {ckpt_dir}: {e}")
        results[str(ckpt_dir)] = {
            "model": meta["model"]["__model_class__"],
            "epoch": meta.get("epoch"),
            **metrics,
        }
        print(ckpt_dir, results[str(ckpt_dir)])
    print(json.dumps(results, indent=2))
