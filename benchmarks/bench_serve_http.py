"""HTTP serving latency/throughput on the real device.

Starts an in-process InferenceServer (loopback) over a freshly-trained
flagship checkpoint and measures end-to-end request latency — socket +
JSON/raw parsing + padded bucketed dispatch + device round trip — plus
a concurrent-clients A/B of request coalescing (micro-batching) vs the
one-dispatch-per-request lock.

Writes benchmarks/BENCH_SERVE_HTTP.json.
"""

from __future__ import annotations

import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def post_raw(base, method, x):
    x = np.ascontiguousarray(x, "<f4")
    req = urllib.request.Request(
        f"{base}/v1/{method}", data=x.tobytes(),
        headers={"Content-Type": "application/octet-stream",
                 "X-Shape": ",".join(str(d) for d in x.shape)},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        shape = tuple(int(s) for s in r.headers["X-Shape"].split(","))
        return np.frombuffer(r.read(), "<f4").reshape(shape)


def pctl(ts, q):
    ts = sorted(ts)
    return ts[min(int(q * len(ts)), len(ts) - 1)]


def concurrent_load(base, x, n_clients, reps):
    """n_clients threads each posting the same small request reps times;
    returns (wall seconds, per-request latencies ms)."""
    lats, errs = [], []

    def client():
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                post_raw(base, "embed", x)
            except Exception as e:  # pragma: no cover - diagnostic
                errs.append(repr(e))
                return
            lats.append((time.perf_counter() - t0) * 1e3)

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    assert not errs, errs[:3]
    return wall, lats


def main():
    import jax

    from hyperbolic_vae_tpu.data.mnist import make_data_module
    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.serve import Inferencer
    from hyperbolic_vae_tpu.serve_http import InferenceServer
    from hyperbolic_vae_tpu.train import Trainer

    dm = make_data_module(batch_size=256, synthetic=True, n_train=2048, n_test=256)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    result = Trainer(model, max_epochs=2, early_stopping_patience=None,
                     check_finite=False).fit(dm)
    inf = Inferencer(model, result.best_params, batch_size=256,
                     max_batches_per_dispatch=8).warmup()
    rows = {}
    coal = {}
    for coalesce in (True, False):
        server = InferenceServer(inf, port=0, coalesce=coalesce).start()
        base = f"http://{server.host}:{server.port}"
        try:
            if coalesce:  # sequential latency: identical either way, run once
                for n, reps in ((8, 50), (256, 50), (2048, 20)):
                    x = dm.x_train[:n]
                    post_raw(base, "embed", x)  # warm path
                    ts = []
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        post_raw(base, "embed", x)
                        ts.append((time.perf_counter() - t0) * 1e3)
                    rows[str(n)] = {
                        "p50_ms": round(pctl(ts, 0.5), 2),
                        "p90_ms": round(pctl(ts, 0.9), 2),
                        "p99_ms": round(pctl(ts, 0.99), 2),
                        "rows_per_sec": round(n / (pctl(ts, 0.5) / 1e3), 1),
                    }
                    print(n, rows[str(n)], flush=True)
            # concurrent small requests: where coalescing matters
            x8 = dm.x_train[:8]
            post_raw(base, "embed", x8)  # warm
            g0 = server.dispatcher.n_dispatches if server.dispatcher else 0
            r0 = server.dispatcher.n_requests if server.dispatcher else 0
            wall, lats = concurrent_load(base, x8, n_clients=16, reps=12)
            arm = {
                "n_clients": 16, "reps": 12, "rows_per_request": 8,
                "wall_s": round(wall, 3),
                "agg_rows_per_sec": round(16 * 12 * 8 / wall, 1),
                "p50_ms": round(pctl(lats, 0.5), 2),
                "p99_ms": round(pctl(lats, 0.99), 2),
            }
            if coalesce and server.dispatcher is not None:
                arm["dispatch_groups"] = server.dispatcher.n_dispatches - g0
                arm["requests"] = server.dispatcher.n_requests - r0
            coal["coalesced" if coalesce else "per_request_lock"] = arm
            print(("coalesced" if coalesce else "lock"), arm, flush=True)
        finally:
            server.shutdown()
    c, l = coal["coalesced"], coal["per_request_lock"]
    coal["speedup"] = round(c["agg_rows_per_sec"] / l["agg_rows_per_sec"], 2)
    out = {
        "what": "end-to-end HTTP embed latency (loopback socket + raw-f32 "
                "wire + padded bucketed dispatch), flagship model",
        "device": str(jax.devices()[0]),
        "batch_size": 256,
        "by_request_rows": rows,
        "concurrent_16x8rows": coal,
    }
    (REPO / "benchmarks" / "BENCH_SERVE_HTTP.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
