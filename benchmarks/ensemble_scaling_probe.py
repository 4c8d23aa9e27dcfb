"""Ablation probe: how does the vmapped ensemble chunk scale with S?

Times one K-epoch vmapped dispatch for S in {1,2,4,8} x several program
variants, to attribute the gap between the ideal (~1x: the flagship's
ops are latency-bound at batch 256, so 8 lanes should ride along nearly
free) and the measured (~5.6x a single epoch at S=8).

Variants:
  full    — the production fit_ensemble program (per-lane shuffle offsets)
  shared  — per-lane batch offsets replaced by ONE shared stream
            (in_axes=None on the data slicing key), isolating the
            batched-gather cost of per-lane dynamic_slice starts
  notrain — val eval removed (train steps only), isolating the per-lane
            full-val evaluation cost

Scratch diagnostics; not part of the committed benchmark suite's
artifacts (writes ENSEMBLE_SCALING.json for inspection).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.data.mnist import synthetic_mnist_arrays
    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.train import Trainer
    from hyperbolic_vae_tpu.train.ensemble import _ens_chunk_fn, _stack

    K = 20
    N_TRAIN, N_VAL, BS = 12800, 1024, 256

    x_train, _, x_val, _ = synthetic_mnist_arrays(N_TRAIN, N_VAL)
    dm = ArrayDataModule(
        x_train=x_train, y_train=np.zeros(len(x_train), np.int32),
        x_val=x_val, y_val=np.zeros(len(x_val), np.int32),
        x_test=x_val, y_test=np.zeros(len(x_val), np.int32),
        batch_size=BS,
    )
    model = GyroplaneVAE(data_shape=x_train.shape[1:], latent_dim=2)
    trainer = Trainer(
        model, max_epochs=K, early_stopping_patience=None,
        plateau_patience=10**6, check_finite=False,
        epochs_per_dispatch=K, shuffle="block",
    )

    xt = trainer._stage(dm.x_train)
    xv = trainer._stage(dm.x_val)

    def states(n_seeds):
        params_l, opt_l, key_l = [], [], []
        for s in range(n_seeds):
            key = jax.random.PRNGKey(s)
            key, init_key = jax.random.split(key)
            p = trainer.init_params(dm.x_train, init_key)
            params_l.append(p)
            opt_l.append(trainer._optimizer.init(p))
            key_l.append(key)
        return (
            _stack(params_l), _stack(opt_l),
            _stack([jax.tree.map(jnp.copy, p) for p in params_l]),
            _stack([trainer._init_ctrl() for _ in range(n_seeds)]),
            jnp.stack(key_l),
        )

    def time_dispatch(fn, n_seeds, reps=3):
        # compile + warm (trailing None = the hp-lane slot, unused here)
        st = states(n_seeds)
        out = fn(*st[:4], xt, xv, st[4], None)
        float(jax.tree.leaves(out[3])[0][0])  # host sync (axon: block_until_ready returns at enqueue)
        times = []
        for _ in range(reps):
            st = states(n_seeds)
            t0 = time.perf_counter()
            out = fn(*st[:4], xt, xv, st[4], None)
            float(jax.tree.leaves(out[3])[0][0])
            times.append(time.perf_counter() - t0)
        return min(times)

    results = {}

    # --- baseline: the UNBATCHED single-seed chunk program
    # hold a HOST copy of the init: the chunk program donates params/opt/
    # best buffers, so every call gets fresh device arrays from this
    plain = trainer._chunk_fn(N_TRAIN, BS, N_VAL, K)
    p_host = jax.tree.map(np.asarray, trainer.init_params(dm.x_train, jax.random.PRNGKey(0)))

    def run_plain(reps=3):
        def fresh():
            p = jax.tree.map(jnp.asarray, p_host)
            return p, trainer._optimizer.init(p), jax.tree.map(jnp.copy, p)

        a, b, c = fresh()
        out = plain(a, b, c, trainer._init_ctrl(), xt, xv, jax.random.PRNGKey(0))
        float(jax.tree.leaves(out[3])[0])
        ts = []
        for _ in range(reps):
            a, b, c = fresh()
            t0 = time.perf_counter()
            out = plain(a, b, c, trainer._init_ctrl(), xt, xv, jax.random.PRNGKey(0))
            float(jax.tree.leaves(out[3])[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results["unbatched_s1"] = run_plain()
    print(f"unbatched S=1: {results['unbatched_s1']*1e3:.1f} ms / {K} epochs", flush=True)

    # --- full vmapped program at S in {1,2,4,8}
    for s in (1, 2, 4, 8):
        fn = _ens_chunk_fn(trainer, N_TRAIN, BS, N_VAL, K, s)
        results[f"full_s{s}"] = time_dispatch(fn, s)
        print(f"full vmap S={s}: {results[f'full_s{s}']*1e3:.1f} ms", flush=True)

    # --- shared-stream variant: vmap with the RNG key SHARED across lanes
    # (in_axes=None -> every lane sees the same shuffle offsets AND the
    # same sampling noise; data slicing collapses to ONE dynamic_slice)
    body = trainer._chunk_body_cache[
        trainer._chunk_cache_key(N_TRAIN, BS, N_VAL, K)
    ]
    for s in (8,):
        fn = jax.jit(jax.vmap(body, in_axes=(0, 0, 0, 0, None, None, None)))
        st = states(s)
        out = fn(*st[:4], xt, xv, jax.random.PRNGKey(0))
        float(jax.tree.leaves(out[3])[0][0])
        ts = []
        for _ in range(3):
            st = states(s)
            t0 = time.perf_counter()
            out = fn(*st[:4], xt, xv, jax.random.PRNGKey(0))
            float(jax.tree.leaves(out[3])[0][0])
            ts.append(time.perf_counter() - t0)
        results[f"sharedkey_s{s}"] = min(ts)
        print(f"shared-key vmap S={s}: {results[f'sharedkey_s{s}']*1e3:.1f} ms", flush=True)

    (REPO_ROOT / "benchmarks" / "ENSEMBLE_SCALING.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
