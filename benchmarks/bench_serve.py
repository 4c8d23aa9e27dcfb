"""Serving latency/throughput: the Inferencer endpoint on the real chip.

Measures per-request latency (p50 over 20 requests, full host round
trip) and steady throughput of `serve.Inferencer.reconstruct` and
`.embed` across request sizes, for the flagship model AND the
production-width RNA-seq model (20,480 genes — the config a real
deployment serves; round 4). The axon dispatch round trip (~25-30 ms)
sets the small-request latency floor; larger requests amortize it
across ceil(N/B) fixed-shape dispatches, after which the WIRE is the
bottleneck (a 2048x20480 f32 request is 168 MB each way on a ~40-90
MB/s tunnel) — the rnaseq arms therefore A/B the f32 wire against the
half-precision `io_dtype="float16"` wire, INTERLEAVED per (endpoint,
size) so tunnel-phase drift (trap 5 applies to transfers too: flagship
reconstruct_n2048 p50 measured 394/481/1251 ms across sessions on
identical code) cannot masquerade as a wire-format effect.

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

    # Fixed-size transfer probe: p50 of a 64 MiB H2D put + D2H fetch.
    # Serving here is transfer-bound, and the tunnel's rate swings
    # session to session (trap 5) — this anchors every arm below to the
    # day's link speed, so BENCH_SERVE deltas across sessions separate
    # code effects from link phase.
    import jax.numpy as jnp

    probe = np.random.default_rng(0).random((16 * 1024 * 1024,), np.float32)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        dev = jnp.asarray(probe)
        _ = np.asarray(dev)[0]
        ts.append(time.perf_counter() - t0)
    ts.sort()
    results["tunnel_probe"] = {
        "bytes_each_way": probe.nbytes,
        "p50_roundtrip_s": round(ts[len(ts) // 2], 3),
        "mb_per_sec_roundtrip": round(2 * probe.nbytes / 2**20 / ts[len(ts) // 2], 1),
    }
    print(json.dumps({"tunnel_probe": results["tunnel_probe"]}),
          file=sys.stderr, flush=True)

    def bench_endpoints(arms, x_pool, reps=20, sizes=(1, 64, 256, 2048)):
        """arms: [(prefix, inferencer), ...] — every (endpoint, n) times
        ALL arms back-to-back (interleaved A/B: tunnel phase drifts on
        minute scales, so arm deltas must be measured adjacently)."""
        for endpoint in ("reconstruct", "embed"):
            for n in sizes:
                tile = (1,) * (x_pool.ndim - 1)
                x = (
                    x_pool[:n]
                    if n <= len(x_pool)
                    else np.tile(x_pool, (n // len(x_pool) + 1, *tile))[:n]
                )
                for _ in range(2):  # warm this shape path on every arm
                    for prefix, inf in arms:
                        getattr(inf, endpoint)(x)
                lats = {prefix: [] for prefix, _ in arms}
                for _ in range(reps):
                    for prefix, inf in arms:
                        fn = getattr(inf, endpoint)
                        t0 = time.perf_counter()
                        fn(x)
                        lats[prefix].append(time.perf_counter() - t0)
                for prefix, _ in arms:
                    ls = sorted(lats[prefix])
                    p50 = ls[len(ls) // 2]
                    key = f"{prefix}{endpoint}_n{n}"
                    results[key] = {
                        "p50_ms": round(p50 * 1e3, 2),
                        "samples_per_sec": round(n / p50, 1),
                    }
                    print(json.dumps({"endpoint": key, **results[key]}),
                          file=sys.stderr, flush=True)

    inf = Inferencer(model, result.best_params, batch_size=256).warmup()
    bench_endpoints([("", inf)], np.asarray(dm.x_train))

    # production-width RNA-seq serving: 20,480-gene encode/reconstruct —
    # the wide matmuls + (round-4 jnp-dispatch) gyroplane decoder.
    # f32 wire vs float16 wire (serve.py io_dtype), interleaved.
    from hyperbolic_vae_tpu.models import RNASeqVAE

    genes, hidden = 20480, 256
    rna = RNASeqVAE(in_features=genes, hidden_dim=hidden, latent_dim=2)
    rng = np.random.default_rng(0)
    xr = rng.normal(0, 1, (2048, genes)).astype(np.float32)
    params = rna.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, xr[:2]
    )["params"]
    results["rnaseq_config"] = {"genes": genes, "hidden": hidden}
    # cap=8: n2048 is exactly ONE full-cap dispatch, and warmup moves
    # half the bytes (the tunnel has slow days — trap 5 applies to
    # transfers; this bench measured 10.2 vs 17.6 s for the identical
    # f32 n2048 arm on different days)
    kw = dict(batch_size=256, max_batches_per_dispatch=8)
    rinf = Inferencer(rna, params, **kw)
    rinf16 = Inferencer(rna, params, io_dtype="float16", **kw)
    # full-batch padding control: what every sub-batch request paid
    # before the round-4 row buckets (21 MB padded batch per 1-row
    # request at this width)
    rpad = Inferencer(rna, params, sub_batch_buckets=False, **kw)
    for i in (rinf, rinf16, rpad):
        i.warmup(methods=("reconstruct", "encode"))
    bench_endpoints(
        [("rnaseq_", rinf), ("rnaseq_f16_", rinf16), ("rnaseq_fullpad_", rpad)],
        xr, sizes=(1, 64),
    )
    bench_endpoints([("rnaseq_", rinf), ("rnaseq_f16_", rinf16)],
                    xr, sizes=(256, 2048), reps=9)

    # headline effects: f16 wire at the transfer-bound size, row buckets
    # at the latency-bound size
    for ep in ("reconstruct", "embed"):
        a = results[f"rnaseq_{ep}_n2048"]["p50_ms"]
        b = results[f"rnaseq_f16_{ep}_n2048"]["p50_ms"]
        results[f"f16_wire_speedup_{ep}_n2048"] = round(a / b, 2)
        a = results[f"rnaseq_fullpad_{ep}_n1"]["p50_ms"]
        b = results[f"rnaseq_{ep}_n1"]["p50_ms"]
        results[f"row_bucket_speedup_{ep}_n1"] = round(a / b, 2)

    (REPO_ROOT / "benchmarks" / "BENCH_SERVE.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
