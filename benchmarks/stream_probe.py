"""fit_streamed on-chip probe: what does host-resident streaming cost?

fit_streamed exists for CAPACITY (training splits larger than device
HBM), not speed — every epoch re-transfers the split host->device. This
probe quantifies the cost honestly on the real chip:

  * resident arm: Trainer.fit with the split staged once in HBM,
  * streamed arms: fit_streamed at J blocks (double-buffered H2D),
  * a raw H2D bandwidth measurement of one block,
  * the effective transfer rate each streamed arm achieves and the
    transfer-bound fraction of its epoch (overlap only becomes visible
    when compute time is comparable to H2D time).

Writes benchmarks/STREAM_PROBE.json.

Usage: python benchmarks/stream_probe.py [--rows 8192] [--genes 20480]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def sync(x):
    """Force completion: on axon, block_until_ready returns at enqueue —
    a host VALUE FETCH is the only reliable sync (CLAUDE.md trap #3)."""
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8192)
    ap.add_argument("--genes", type=int, default=20480)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--blocks", type=int, nargs="+", default=[2, 4])
    args = ap.parse_args()

    import jax

    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.models import RNASeqVAE
    from hyperbolic_vae_tpu.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.random((args.rows + 1024, args.genes), dtype=np.float32)
    n_val = 512
    dm = ArrayDataModule(
        x_train=x[: args.rows],
        y_train=np.full(args.rows, -1, np.int32),
        x_val=x[args.rows : args.rows + n_val],
        y_val=np.full(n_val, -1, np.int32),
        x_test=x[args.rows + n_val :],
        y_test=np.full(512, -1, np.int32),
        batch_size=args.batch_size,
        name="stream_probe",
    )
    block_mb = lambda j: args.rows // j * args.genes * 4 / 1e6

    def make_trainer():
        model = RNASeqVAE(
            in_features=args.genes, latent_dim=2, hidden_dim=args.hidden
        )
        return Trainer(
            model, max_epochs=args.epochs, early_stopping_patience=None,
            check_finite=False, shuffle="block",
        )

    out = {
        "rows": args.rows, "genes": args.genes,
        "split_mb": round(args.rows * args.genes * 4 / 1e6, 1),
        "device": str(jax.devices()[0]),
    }

    # raw H2D bandwidth of one J=4-sized block (median of 3)
    blk = np.ascontiguousarray(x[: args.rows // 4])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(blk)
        sync(d)
        ts.append(time.perf_counter() - t0)
        del d
    h2d_s = sorted(ts)[1]
    out["h2d_mb_per_s"] = round(block_mb(4) / h2d_s, 1)

    r = make_trainer().fit(dm)
    out["resident_samples_per_sec"] = round(r.samples_per_sec, 1)
    resident_epoch_s = (args.rows // args.batch_size) * args.batch_size / max(
        r.samples_per_sec, 1e-9
    )
    out["resident_epoch_ms"] = round(resident_epoch_s * 1e3, 1)

    for j in args.blocks:
        rs = make_trainer().fit_streamed(dm, block_rows=args.rows // j)
        sps = rs.samples_per_sec
        epoch_s = (args.rows // args.batch_size) * args.batch_size / max(sps, 1e-9)
        # In the transfer-bound regime (tunnel H2D << compute rate) the
        # honest characterization is the effective transfer rate the
        # streamed epoch achieves and how much of the epoch is transfer;
        # overlap only becomes visible when compute is comparable to H2D.
        xfer_s = max(epoch_s - resident_epoch_s, 1e-9)
        out[f"streamed_j{j}"] = {
            "block_mb": round(block_mb(j), 1),
            "samples_per_sec": round(sps, 1),
            "epoch_ms": round(epoch_s * 1e3, 1),
            "effective_h2d_mb_per_s": round(out["split_mb"] / xfer_s, 1),
            "transfer_bound_fraction": round(xfer_s / epoch_s, 3),
        }
        print(j, out[f"streamed_j{j}"], flush=True)

    path = REPO / "benchmarks" / "STREAM_PROBE.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
