#!/bin/bash
# Round-4 figure-parity set (VERDICT item 2): one converged run per
# reference figure family, sequential on the single TPU chip.
# NOTE: the compile relay can take 25+ min per fresh program today —
# run this whole script in the background and let it grind.
cd /root/repo
set -x

# 0. verify leg for the round-4 LatentScatterCallback latent_dim>2 path
#    (plots the first two posterior-mean coordinates like the reference)
python -u experiments/train_vae_hyperbolic_mnist_gyroplane.py --synthetic \
  --epochs 10 --latent-dim 5 --run-dir runs/figset_r4/verify_scatter_d5 \
  > runs/figset_r4/verify_scatter_d5.log 2>&1

# 1. Fabricate a real-GEO-format structured CSV pair (cells x genes)
#    for the Jerby-Arnon-layout figure — same layout as GSE115978
#    (genes-as-rows TPM CSV + annotations CSV), structured fake so the
#    latent disk carries cell-type signal.
python -u - > runs/figset_r4/fabricate.log 2>&1 <<'EOF'
import numpy as np, pandas as pd
from pathlib import Path
from hyperbolic_vae_tpu.data.jerby_arnon import make_fake_arrays
n_cells, n_genes = 4096, 20480
x, cell_types, gene_symbols, cell_ids = make_fake_arrays(
    n_cells, n_genes, seed=7, structured=True)
d = Path("runs/figset_r4/jerby_csv"); d.mkdir(parents=True, exist_ok=True)
pd.DataFrame({"cells": cell_ids, "cell.types": cell_types,
              "samples": ["s1"] * n_cells}).to_csv(d / "annotations.csv", index=False)
tpm = pd.DataFrame(x.T.astype(np.float32), index=gene_symbols, columns=cell_ids)
tpm.index.name = ""
tpm.to_csv(d / "tpm.csv")
print("wrote", d)
EOF

python -u experiments/train_vae_euclidean_mnist.py --synthetic --epochs 300 \
  --epochs-per-dispatch 10 --run-dir runs/figset_r4/euclid_mnist \
  > runs/figset_r4/euclid_mnist.log 2>&1

python -u experiments/train_vae_hyperbolic_mnist.py --synthetic --epochs 300 \
  --epochs-per-dispatch 10 --run-dir runs/figset_r4/hyp_conv_mse \
  > runs/figset_r4/hyp_conv_mse.log 2>&1

python -u experiments/train_vae_hyperbolic_mnist.py --synthetic --epochs 300 \
  --epochs-per-dispatch 10 --loss-recon bernoulli \
  --run-dir runs/figset_r4/hyp_conv_bernoulli \
  > runs/figset_r4/hyp_conv_bernoulli.log 2>&1

python -u experiments/train_vae_euclidean_cifar10.py --synthetic --epochs 300 \
  --epochs-per-dispatch 10 --run-dir runs/figset_r4/euclid_cifar \
  > runs/figset_r4/euclid_cifar.log 2>&1

python -u experiments/train_vaes_rnaseq.py --rnaseq-dir runs/figset_r4/jerby_csv \
  --epochs 120 --epochs-per-dispatch 10 --no-early-stopping --batch-size 256 \
  --run-dir runs/figset_r4/jerby \
  > runs/figset_r4/jerby.log 2>&1

echo DONE_FIGSET
