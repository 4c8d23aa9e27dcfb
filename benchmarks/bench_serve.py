"""Serving latency/throughput: the Inferencer endpoint on the real chip.

Measures per-request latency (p50 over 20 requests, full host round
trip) and steady throughput of `serve.Inferencer.reconstruct` and
`.embed` across request sizes, for the flagship model. The axon
dispatch round trip (~25-30 ms) sets the small-request latency floor;
larger requests amortize it across ceil(N/B) fixed-shape dispatches.

Run manually on the chip: python benchmarks/bench_serve.py
Writes benchmarks/BENCH_SERVE.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main():
    import numpy as np
    import jax

    from hyperbolic_vae_tpu import Inferencer
    from hyperbolic_vae_tpu.data.mnist import make_data_module
    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.train import Trainer

    dm = make_data_module(batch_size=256, synthetic=True, n_train=2560, n_test=256)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(model, max_epochs=3, early_stopping_patience=None, check_finite=False)
    result = trainer.fit(dm)

    results = {"device": str(jax.devices()[0]), "batch_size": 256}
    inf = Inferencer(model, result.best_params, batch_size=256).warmup()
    for endpoint in ("reconstruct", "embed"):
        fn = getattr(inf, endpoint)
        for n in (1, 64, 256, 2048):
            x = dm.x_train[:n] if n <= len(dm.x_train) else np.tile(dm.x_train, (n // len(dm.x_train) + 1, 1, 1, 1))[:n]
            fn(x)  # warm this shape path
            lats = []
            for _ in range(20):
                t0 = time.perf_counter()
                fn(x)
                lats.append(time.perf_counter() - t0)
            lats.sort()
            p50 = lats[len(lats) // 2]
            key = f"{endpoint}_n{n}"
            results[key] = {
                "p50_ms": round(p50 * 1e3, 2),
                "samples_per_sec": round(n / p50, 1),
            }
            print(json.dumps({"endpoint": key, **results[key]}), file=sys.stderr, flush=True)
    (REPO_ROOT / "benchmarks" / "BENCH_SERVE.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
