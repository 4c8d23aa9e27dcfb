"""ELBO parity: JAX/TPU flagship vs the torch-CPU implementation on
IDENTICAL data.

The reference publishes no numbers (BASELINE.md), so parity is
self-generated: train benchmarks/torch_baseline.TorchGyroplaneVAE (the
reference's flagship semantics in torch) and
hyperbolic_vae_tpu.models.GyroplaneVAE on the same synthetic MNIST
arrays, same batch size / lr / epochs, and compare final validation
loss_total (negative ELBO per sample). Driver target: within 1%.

Usage: python benchmarks/parity.py [--epochs 15] [--n-train 12800]
Writes PARITY.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np


def train_torch(x_train, x_val, epochs, batch_size, lr, seed=0):
    import torch

    from benchmarks.torch_baseline import TorchGyroplaneVAE

    torch.manual_seed(seed)
    numel = int(np.prod(x_train.shape[1:]))
    model = TorchGyroplaneVAE(data_numel=numel)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    xt = torch.from_numpy(x_train.reshape(len(x_train), -1))
    xv = torch.from_numpy(x_val.reshape(len(x_val), -1))
    n = (len(xt) // batch_size) * batch_size
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        perm = rng.permutation(len(xt))[:n]
        for i in range(0, n, batch_size):
            opt.zero_grad()
            loss = model.loss(xt[perm[i : i + batch_size]])
            loss.backward()
            opt.step()
        with torch.no_grad():
            val = float(model.loss(xv))
        history.append(val)
    return history


def train_jax(x_train, x_val, epochs, batch_size, lr, seed=0):
    import jax

    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.train import Trainer

    y = np.zeros(len(x_train), np.int32)
    dm = ArrayDataModule(
        x_train=x_train, y_train=y,
        x_val=x_val, y_val=np.zeros(len(x_val), np.int32),
        x_test=x_val, y_test=np.zeros(len(x_val), np.int32),
        batch_size=batch_size,
    )
    model = GyroplaneVAE(data_shape=x_train.shape[1:], latent_dim=2, lr=lr)
    trainer = Trainer(model, lr=lr, max_epochs=epochs, seed=seed,
                      early_stopping_patience=None, check_finite=True)
    result = trainer.fit(dm)
    return [h["val/loss_total"] for h in result.history]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--n-train", type=int, default=12800)
    ap.add_argument("--n-val", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args()

    from hyperbolic_vae_tpu.data.mnist import synthetic_mnist_arrays

    x_train, _, x_val, _ = synthetic_mnist_arrays(args.n_train, args.n_val)

    t0 = time.perf_counter()
    jax_hist = train_jax(x_train, x_val, args.epochs, args.batch_size, args.lr)
    t_jax = time.perf_counter() - t0
    print(f"jax: final val loss {jax_hist[-1]:.3f} in {t_jax:.0f}s", file=sys.stderr)

    out = {
        "config": vars(args),
        "jax_val_loss": jax_hist,
        "jax_final": jax_hist[-1],
        "jax_seconds": t_jax,
    }
    if not args.skip_torch:
        t0 = time.perf_counter()
        torch_hist = train_torch(x_train, x_val, args.epochs, args.batch_size, args.lr)
        t_torch = time.perf_counter() - t0
        print(f"torch: final val loss {torch_hist[-1]:.3f} in {t_torch:.0f}s", file=sys.stderr)
        out.update(
            torch_val_loss=torch_hist,
            torch_final=torch_hist[-1],
            torch_seconds=t_torch,
            final_rel_diff=abs(jax_hist[-1] - torch_hist[-1]) / max(abs(torch_hist[-1]), 1e-9),
            speedup_total=t_torch / max(t_jax, 1e-9),
        )
    (REPO_ROOT / "PARITY.json").write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if not isinstance(v, list)}))


if __name__ == "__main__":
    main()
