"""Secondary benchmark: RNA-seq-scale hyperbolic VAE throughput.

The flagship MNIST model is VPU-latency bound; the RNA-seq family's
(B, ~20k genes) Dense layers are the model family's real MXU work. This
measures train samples/sec for RNASeqVAE at GSE115978-like width on the
current accelerator. Not part of the driver's bench.py contract — run
manually: python benchmarks/bench_rnaseq.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

N_GENES = 20480
N_CELLS = 8192
BATCH = 256
HIDDEN = 256


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.models import RNASeqVAE
    from hyperbolic_vae_tpu.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (N_CELLS, N_GENES)).astype(np.float32)
    y = np.zeros(N_CELLS, np.int32)
    dm = ArrayDataModule(
        x_train=x, y_train=y, x_val=x[:512], y_val=y[:512],
        x_test=x[:512], y_test=y[:512], batch_size=BATCH,
    )
    model = RNASeqVAE(in_features=N_GENES, hidden_dim=HIDDEN, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=1, early_stopping_patience=None, shuffle="block",
        check_finite=False,
    )
    params = trainer.init_params(dm.x_train)
    opt_state = trainer._optimizer.init(params)
    xd = jnp.asarray(dm.x_train)
    train_epoch, _ = trainer._build_epoch_fns(N_CELLS, BATCH, 512)
    key = jax.random.PRNGKey(0)
    for _ in range(2):  # compile + warm
        key, k = jax.random.split(key)
        params, opt_state, ms = train_epoch(params, opt_state, xd, k)
        float(ms["loss_total"])
    steps = N_CELLS // BATCH
    times = []
    for _ in range(5):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, ms = train_epoch(params, opt_state, xd, k)
        float(ms["loss_total"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    sps = steps * BATCH / dt
    # fwd+bwd FLOPs are ~3 x 2 x B x G x H for the two wide Dense layers x2
    flops_per_step = 3 * 2 * BATCH * N_GENES * HIDDEN * 2
    tflops = flops_per_step * steps / dt / 1e12
    print(
        json.dumps(
            {
                "metric": "rnaseq_vae_train_throughput",
                "value": round(sps, 1),
                "unit": "samples/sec/chip",
                "genes": N_GENES,
                "hidden": HIDDEN,
                "epoch_ms": round(dt * 1000, 1),
                "approx_tflops": round(tflops, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
