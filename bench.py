"""Headline benchmark: flagship MNIST hyperbolic VAE train throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

value       = train samples/sec/chip of the jitted full-epoch training
              loop (GyroplaneVAE, batch 256, Poincare 2-D latent, c=1.0)
              on the available accelerator (TPU under axon; driver runs
              this on real hardware).
vs_baseline = value / (PyTorch-CPU per-step baseline samples/sec).
              The reference publishes no numbers (BASELINE.md), so the
              baseline is self-measured once by benchmarks/torch_baseline.py
              (an independent torch implementation of the same math with
              the reference's per-step dispatch structure) and cached in
              BASELINE_TORCH.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

BASELINE_FILE = REPO_ROOT / "BASELINE_TORCH.json"
BATCH_SIZE = 256
N_TRAIN = 60000
TIMED_EPOCHS = 5


def get_torch_baseline() -> float:
    if BASELINE_FILE.exists():
        return json.loads(BASELINE_FILE.read_text())["samples_per_sec"]
    from benchmarks.torch_baseline import measure_samples_per_sec

    sps = measure_samples_per_sec(batch_size=BATCH_SIZE)
    BASELINE_FILE.write_text(
        json.dumps(
            {
                "samples_per_sec": sps,
                "what": "torch-CPU per-step flagship equivalent (benchmarks/torch_baseline.py)",
                "batch_size": BATCH_SIZE,
            }
        )
    )
    return sps


def bench_jax() -> dict:
    """Time the flagship train path; returns the throughput/attribution
    dict consumed by main() (per-epoch dispatch, chunked steady state,
    device-vs-overhead split, slope sanity flag)."""
    import jax

    from hyperbolic_vae_tpu.data import mnist
    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.train import Trainer

    dm = mnist.make_data_module(batch_size=BATCH_SIZE, synthetic=True, n_train=N_TRAIN, n_test=512)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2, manifold_curvature=1.0)
    # block shuffle: per-row gathers are DMA-latency bound on TPU
    # (~2x whole-epoch cost); convergence equivalence vs row shuffle is
    # validated in benchmarks/parity.py + tests
    trainer = Trainer(
        model, max_epochs=1, early_stopping_patience=None, check_finite=False,
        shuffle="block",
    )

    import jax.numpy as jnp

    params = trainer.init_params(dm.x_train)
    opt_state = trainer._optimizer.init(params)
    x_train = jnp.asarray(dm.x_train)
    n_train = int(x_train.shape[0])
    train_epoch, _ = trainer._build_epoch_fns(n_train, dm.batch_size, 512)

    key = jax.random.PRNGKey(0)
    # compile + 2 warmup epochs (first post-compile epoch can still pay
    # one-time costs on some backends)
    # NB: on some remote backends block_until_ready returns at enqueue,
    # not completion — a host VALUE FETCH is the only reliable sync.
    for _ in range(2):
        key, k = jax.random.split(key)
        params, opt_state, ms = train_epoch(params, opt_state, x_train, k)
        float(ms["loss_total"])

    steps = n_train // dm.batch_size
    # median of per-epoch wall times, each fully synchronized
    times = []
    for _ in range(TIMED_EPOCHS):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, ms = train_epoch(params, opt_state, x_train, k)
        float(ms["loss_total"])
        times.append(time.perf_counter() - t0)
    assert float(ms["loss_total"]) == float(ms["loss_total"]), "NaN loss in bench"
    print(f"per-epoch times (s): {[round(t, 4) for t in times]}", file=sys.stderr)
    times.sort()
    dt = times[len(times) // 2]
    n_chips = max(jax.device_count(), 1)
    per_epoch_dispatch = steps * dm.batch_size / dt / n_chips

    # Steady state of the Trainer's K-epochs-per-dispatch fit program
    # (Trainer(epochs_per_dispatch=K), train/test_chunked_fit.py): the
    # per-epoch host round trip (~25-30 ms on the axon tunnel) amortizes
    # over K epochs. The chunk program does strictly MORE work per epoch
    # than the loop above (adds a full val-split eval + in-graph
    # best-params tracking), so this is a conservative steady-state
    # throughput of the actual product path.
    import jax.numpy as jnp

    # K=50: same-session A/B (round 3) measured 15.5 / 14.4 / 14.2
    # ms/epoch at K=20/50/100 — the ~25 ms dispatch overhead amortizes
    # as device-time/epoch + overhead/K, with K=50 within 2% of the
    # asymptote. Controllers (plateau LR, early stop) run IN-GRAPH, so
    # chunked semantics match K=1 exactly for any K.
    #
    # Variance control (round 4): the chip's throughput phase drifts
    # run-to-run (CLAUDE.md trap 5: 11.3 vs 14.5 ms/epoch for identical
    # code hours apart), so one median is not interpretable across
    # rounds. Timing TWO chunk lengths inside the SAME session separates
    # t(K) = overhead + K * device_time_per_epoch by slope — the
    # device-time number is the one chip phase moves, and the dispatch
    # overhead is the axon-tunnel constant.
    n_val = int(dm.x_val.shape[0])
    x_val = jnp.asarray(dm.x_val)

    def time_chunk(K, reps=3):
        nonlocal key, params, opt_state
        chunk_fn = trainer._chunk_fn(n_train, dm.batch_size, n_val, K)
        best_params = jax.tree.map(jnp.copy, params)
        ctrl = trainer._init_ctrl()
        key, k = jax.random.split(key)
        p, o = params, opt_state
        p, o, best_params, ctrl, k, tms, vms, _ = chunk_fn(
            p, o, best_params, ctrl, x_train, x_val, k
        )
        float(tms["loss_total"][-1])  # compile + sync
        ts = []
        for _ in range(reps):
            key, k2 = jax.random.split(key)
            t0 = time.perf_counter()
            p, o, best_params, ctrl, k2, tms, vms, _ = chunk_fn(
                p, o, best_params, ctrl, x_train, x_val, k2
            )
            float(tms["loss_total"][-1])
            ts.append(time.perf_counter() - t0)
        # params/opt were donated into the chunk program — carry forward
        params, opt_state = p, o
        ts.sort()
        return ts  # sorted: [min, median, ...]

    K_SMALL, K = 10, 50
    t_small = time_chunk(K_SMALL)
    t_big = time_chunk(K)
    med_small, med_big = t_small[len(t_small) // 2], t_big[len(t_big) // 2]
    device_s_per_epoch = (med_big - med_small) / (K - K_SMALL)
    overhead_s = med_small - K_SMALL * device_s_per_epoch
    cdt = med_big / K
    cdt_min = t_big[0] / K
    # Slope sanity: the two timing groups are minutes apart, so a chip
    # phase shift BETWEEN them (trap 5) can make the fit non-physical
    # (negative overhead, or device time above the whole-chunk mean).
    # Flag it and fall back to honest bounds rather than recording
    # nonsense in the round artifact.
    slope_fit_ok = 0.0 < device_s_per_epoch <= med_big / K and overhead_s >= 0.0
    if not slope_fit_ok:
        print(
            f"slope fit non-physical (device {device_s_per_epoch*1e3:.2f} "
            f"ms/epoch, overhead {overhead_s*1e3:.2f} ms) — chip phase "
            "shifted between the K-groups; reporting med(K=50)/K as the "
            "device-time upper bound",
            file=sys.stderr,
        )
        device_s_per_epoch = cdt  # upper bound: includes 1/K of overhead
        overhead_s = 0.0
    print(
        f"chunked per-epoch: K={K_SMALL} {[round(t,4) for t in t_small]} s, "
        f"K={K} {[round(t,4) for t in t_big]} s -> median {cdt*1e3:.1f} "
        f"ms/epoch (min {cdt_min*1e3:.1f}); device {device_s_per_epoch*1e3:.1f} "
        f"ms/epoch + {overhead_s*1e3:.1f} ms/dispatch overhead",
        file=sys.stderr,
    )
    chunked = steps * dm.batch_size / cdt / n_chips
    chunked_min_t = steps * dm.batch_size / cdt_min / n_chips
    return {
        "per_epoch_dispatch": per_epoch_dispatch,
        "chunked": chunked,
        "chunked_best": chunked_min_t,
        "K": K,
        "device_ms_per_epoch": device_s_per_epoch * 1e3,
        "dispatch_overhead_ms": overhead_s * 1e3,
        "slope_fit_ok": slope_fit_ok,
    }


def chip_phase_control(current_single_dispatch: float):
    """Ratio of this session's K=1 full-epoch dispatch throughput to the
    most recent recorded round's — same code path every round, so the
    ratio isolates chip phase (trap 5) from code changes when comparing
    BENCH_r{N}.json across rounds."""
    import re

    rounds = sorted(
        REPO_ROOT.glob("BENCH_r*.json"),
        key=lambda p: int(re.findall(r"\d+", p.stem)[0]),
    )
    if not rounds:
        return None
    prior = json.loads(rounds[-1].read_text()).get("parsed", {})
    prev = prior.get("value_single_dispatch")
    if not prev:
        return None
    return {
        "prior_round": rounds[-1].stem,
        "prior_single_dispatch": prev,
        "ratio": round(current_single_dispatch / prev, 3),
    }


def main():
    r = bench_jax()
    baseline = get_torch_baseline()
    print(
        json.dumps(
            {
                "metric": "mnist_gyroplane_vae_train_throughput",
                "value": round(r["chunked"], 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(r["chunked"] / baseline, 2),
                "epochs_per_dispatch": r["K"],
                "value_single_dispatch": round(r["per_epoch_dispatch"], 1),
                "value_best_dispatch_group": round(r["chunked_best"], 1),
                "device_ms_per_epoch": round(r["device_ms_per_epoch"], 2),
                "dispatch_overhead_ms": round(r["dispatch_overhead_ms"], 2),
                "slope_fit_ok": r["slope_fit_ok"],
                "chip_phase_control": chip_phase_control(r["per_epoch_dispatch"]),
            }
        )
    )


if __name__ == "__main__":
    main()
