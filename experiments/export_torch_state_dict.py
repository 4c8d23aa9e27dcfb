"""Export a trained checkpoint back to the reference's torch layout:
self-describing Orbax checkpoint -> .npz state_dict that the matching
reference torch module loads (see interop/torch_export.py for the layer
mappings and the gyroplane-bias caveat).

    python experiments/export_torch_state_dict.py runs/flagship/ckpt \
        --out flagship_torch.npz
    # torch side: sd = {k: torch.from_numpy(v) for k, v in np.load(f).items()}
"""

from __future__ import annotations

import argparse
import os

from common import REPO_ROOT  # noqa: F401 (import fixes sys.path)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", type=str, help="self-describing checkpoint dir")
    p.add_argument("--name", type=str, default="best", help="best/last/ema/...")
    p.add_argument("--out", type=str, required=True, help="output .npz path")
    args = p.parse_args()

    if os.environ.get("HVAE_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from hyperbolic_vae_tpu.interop import export_torch_state_dict
    from hyperbolic_vae_tpu.train.checkpoint import restore_model

    model, params, _ = restore_model(args.checkpoint, args.name)
    sd = export_torch_state_dict(model, params)
    np.savez(args.out, **sd)
    print(f"exported {type(model).__name__} -> {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
