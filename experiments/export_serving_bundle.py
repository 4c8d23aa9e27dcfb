"""Export a trained checkpoint as a model-code-free serving bundle.

The deployment step the reference has no analogue for (its closest
serving story is calling ``pl_module.reconstruct`` in a callback,
/root/reference/hyperbolic_vae/training/generate_callback.py:23-35):

    python experiments/export_serving_bundle.py --ckpt runs/x/ckpt --out bundle/

restores the self-describing checkpoint (any model family), traces the
full bucketed program set, and writes jax.export StableHLO programs +
params npz + manifest. Serve it anywhere with just jax:

    from hyperbolic_vae_tpu.serve import ExportedInferencer
    inf = ExportedInferencer.load("bundle/")
    mu = inf.embed(x)
"""

import argparse
import os
from pathlib import Path

if os.environ.get("HVAE_FORCE_CPU"):
    # the axon sitecustomize overrides JAX_PLATFORMS; config wins
    import jax

    jax.config.update("jax_platforms", "cpu")

from hyperbolic_vae_tpu.serve import Inferencer

if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True, help="Trainer checkpoint dir")
    p.add_argument("--name", type=str, default="best", choices=["best", "last"])
    p.add_argument("--out", type=str, required=True, help="bundle output dir")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--max-batches-per-dispatch", type=int, default=16)
    p.add_argument(
        "--methods", type=str, nargs="+", default=["encode", "decode", "reconstruct"]
    )
    p.add_argument(
        "--data-shape", type=int, nargs="+", default=None,
        help="input feature shape override (derived from the restored "
        "model's data_shape/input_size/in_features when omitted)",
    )
    p.add_argument(
        "--platforms", type=str, nargs="+", default=["cpu", "tpu"],
        help="lowering targets baked into the bundle",
    )
    p.add_argument(
        "--io-dtype", default=None, choices=["float16", "bfloat16"],
        help="bake a half-precision wire format into the bundle's "
        "programs (serve.py Inferencer io_dtype)",
    )
    p.add_argument(
        "--no-sub-batch-buckets", action="store_true",
        help="skip the power-of-two row-bucket programs for small requests",
    )
    args = p.parse_args()

    inf = Inferencer.from_checkpoint(
        args.ckpt, name=args.name, batch_size=args.batch_size,
        max_batches_per_dispatch=args.max_batches_per_dispatch,
        io_dtype=args.io_dtype,
        sub_batch_buckets=not args.no_sub_batch_buckets,
    )
    out = inf.export_programs(
        args.out, methods=tuple(args.methods),
        data_shape=tuple(args.data_shape) if args.data_shape else None,
        platforms=tuple(args.platforms),
    )
    n = len(list(Path(out).glob("*.stablehlo")))
    # generate is key-driven: it exports dispatch-bucket programs only
    # (no row buckets — serve.py export_programs), so count it apart
    n_gen = sum(m == "generate" for m in args.methods)
    n_data = len(args.methods) - n_gen
    print(
        f"exported {n} programs ({n_data} data methods x "
        f"({len(inf._row_buckets)} row-buckets + {len(inf._buckets)} "
        f"dispatch-buckets)"
        + (f" + {n_gen} generate x {len(inf._buckets)} dispatch-buckets"
           if n_gen else "")
        + f") -> {out}"
    )
