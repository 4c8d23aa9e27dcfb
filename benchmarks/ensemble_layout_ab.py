"""Ensemble layout A/B: can any layout beat vmap lanes on DEVICE time?

Round-4 VERDICT #2: the vmapped seed ensemble costs ~1.87x the device
time of 8 sequential chunks (ENSEMBLE_SCALING.json), the shared-RNG
control bounds the per-lane data-slicing share at ~26%, and the rest was
attributed to sublane-padded (S, 256, 16/64) layouts without measurement.
This script measures the candidate layouts head-to-head ON CHIP, at two
levels (CLAUDE.md trap 6: step-level numbers inform, FULL-chunk numbers
decide):

Step-level Dense-stack probe (fwd+bwd+sgd through the flagship's MLP
widths 784->64->16->2 and 16->64->784, S=8 per-lane weight sets,
B=256):
  vmap_dense    — jax.vmap over the seed axis (what fit_ensemble lowers
                  to: batched matmuls (S,B,i)x(S,i,o))
  fold_outconcat— (S*B, i) @ (i, S*o) one big matmul + block-diagonal
                  mask. S x the FLOPs, but one well-shaped MXU call
                  (784x512 fills the 128-lane tiles the 784x64 batched
                  form wastes); wins iff batched-matmul efficiency at
                  these widths is below 1/S.
  fold_blockdiag— (S*B, S*i) @ (S*i, S*o) explicit block-diagonal weight
                  matrix (S^2 x the weight FLOPs; the naive "single
                  matmul" folding).

Full-chunk arms (K=20 epochs per dispatch, the production program):
  seq_sum       — 8 sequential single-seed chunks (device-time floor to
                  beat)
  vmap_full     — production _ens_chunk_fn at S=8
  vmap_sharedkey— the same body with the PRNG key broadcast
                  (in_axes=None): lanes share schedule AND noise; bounds
                  the per-lane data-slicing share.

Writes ENSEMBLE_LAYOUT_AB.json with the measured table + attribution.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import timed_reps

S, B = 8, 256
WIDTHS = [784, 64, 16, 2]  # encoder stack; decoder mirrors it


def _init_lane_weights(key, widths):
    ws, bs = [], []
    for i, (fi, fo) in enumerate(zip(widths[:-1], widths[1:])):
        key, k1 = jax.random.split(key)
        ws.append(jax.random.normal(k1, (fi, fo), jnp.float32) / np.sqrt(fi))
        bs.append(jnp.zeros((fo,), jnp.float32))
    return ws, bs


def _stack_lanes(key, widths, s=S):
    lanes = [_init_lane_weights(jax.random.fold_in(key, i), widths) for i in range(s)]
    ws = [jnp.stack([l[0][j] for l in lanes]) for j in range(len(widths) - 1)]
    bs = [jnp.stack([l[1][j] for l in lanes]) for j in range(len(widths) - 1)]
    return ws, bs


def _mlp(ws, bs, x):
    h = x
    for w, b in zip(ws, bs):
        h = jnp.tanh(h @ w + b)
    return h


SCAN_STEPS = 2000  # long enough that the ~30 ms axon dispatch overhead
# is <15% of the dispatch (trap 6: a 50-step scan measured all arms at
# ~540 us/step = dispatch/50, resolving nothing)


def step_probe():
    """fwd+bwd+sgd through the stacked Dense pyramid, per layout.
    Loss = mean(h_out^2): enough to drive a full backward pass.

    Extra attribution arms beyond the three layouts:
      shared_dense — ONE weight set shared across lanes (per-lane data
                     only): the vmap_dense/shared_dense ratio is the
                     pure batched-matmul (per-lane weights) penalty.
      single_lane  — one (B, 784) lane; x8 = the sequential step floor.
    """
    results = {}
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 99), (S, B, WIDTHS[0]), jnp.float32)
    ws, bs = _stack_lanes(key, WIDTHS)

    # --- arm 1: vmap over lanes (production lowering)
    def loss_vmap(params, x):
        ws, bs = params
        out = jax.vmap(_mlp)(ws, bs, x)
        return jnp.mean(out * out)

    # --- arm 2: fold the seed axis into rows; weights concatenated on the
    # OUTPUT axis; a (S, S) block mask zeroes cross-lane products.
    # x2 (S*B, i) @ w_cat (i, S*o) -> (S*B, S*o); row sb must keep only
    # block s. Implemented as reshape to (S, B, S, o) and einsum-diag.
    def loss_fold(params, x):
        ws, bs = params
        h = x.reshape(S * B, WIDTHS[0])
        for j, (w, b) in enumerate(zip(ws, bs)):
            fi, fo = w.shape[1], w.shape[2]
            w_cat = jnp.transpose(w, (1, 0, 2)).reshape(fi, S * fo)
            y = (h @ w_cat).reshape(S, B, S, fo)
            # take the diagonal (s == lane block s)
            y = jnp.einsum("sbso->sbo", y) + b[:, None, :]
            h = jnp.tanh(y).reshape(S * B, fo)
        return jnp.mean(h * h)

    # --- arm 3: explicit block-diagonal weights (S*i, S*o)
    def loss_blockdiag(params, x):
        ws, bs = params
        h = jnp.transpose(x, (1, 0, 2)).reshape(B, S * WIDTHS[0])
        eye = jnp.eye(S, dtype=jnp.float32)
        for w, b in zip(ws, bs):
            fi, fo = w.shape[1], w.shape[2]
            # block (s, t) = eye[s, t] * w[s]  ->  (S*fi, S*fo)
            wbd = (eye[:, None, :, None] * w[:, :, None, :]).reshape(S * fi, S * fo)
            h = jnp.tanh(h @ wbd + b.reshape(S * fo))
        return jnp.mean(h * h)

    # --- attribution arm: weights SHARED across lanes (per-lane data
    # only) — isolates the batched-matmul penalty of per-lane weights
    ws1, bs1 = _init_lane_weights(key, WIDTHS)

    def loss_shared(params, x):
        ws, bs = params
        out = _mlp(ws, bs, x.reshape(S * B, WIDTHS[0]))
        return jnp.mean(out * out)

    # --- attribution arm: ONE lane (x8 = sequential step floor)
    def loss_single(params, x):
        ws, bs = params
        out = _mlp(ws, bs, x[0])
        return jnp.mean(out * out)

    for name, loss, params in (
        ("vmap_dense", loss_vmap, (ws, bs)),
        ("fold_outconcat", loss_fold, (ws, bs)),
        ("fold_blockdiag", loss_blockdiag, (ws, bs)),
        ("shared_dense", loss_shared, (ws1, bs1)),
        ("single_lane", loss_single, (ws1, bs1)),
    ):
        def train_step(params, x, _loss=loss):
            g = jax.grad(_loss)(params, x)
            return jax.tree.map(lambda p, gg: p - 1e-3 * gg, params, g)

        @jax.jit
        def scan_steps(params, x, _step=train_step):
            def body(p, _):
                return _step(p, x), None
            p, _ = jax.lax.scan(body, params, None, length=SCAN_STEPS)
            return p

        def step(_params=params):
            out = scan_steps(_params, x)
            float(np.asarray(out[0][0]).ravel()[0])  # host sync (axon enqueue trap)

        ts = timed_reps(step, warmup=2, reps=5)
        results[name] = ts[len(ts) // 2] / SCAN_STEPS
        print(f"  {name}: {results[name]*1e6:.1f} us/step", flush=True)
    return results


def model_step_probe():
    """The REAL flagship loss (manifold sampling + gyroplane + KL chain),
    fwd+bwd+sgd, single lane vs vmapped x8 — pins how much of the
    ensemble penalty is the VPU-bound manifold chain (which does 8x real
    elementwise work under vmap: 'lanes ride free' only holds for
    MXU-underutilized matmuls, not VPU-throughput-bound chains)."""
    from hyperbolic_vae_tpu.models import GyroplaneVAE

    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2)
    key = jax.random.PRNGKey(0)
    x1 = jax.random.uniform(key, (B, 28, 28, 1), jnp.float32)
    xs = jnp.stack([x1] * S)

    def init(seed):
        return model.init(
            {"params": jax.random.PRNGKey(seed), "sample": jax.random.PRNGKey(seed + 1)},
            x1, method="loss",
        )["params"]

    p1 = init(0)
    ps = jax.tree.map(lambda *a: jnp.stack(a), *[init(s) for s in range(S)])

    def loss1(p, x, k):
        return model.apply({"params": p}, x, method="loss", rngs={"sample": k})["loss_total"]

    results = {}
    for name, loss, params, x, kaxis in (
        ("model_single", loss1, p1, x1, None),
        ("model_vmap", jax.vmap(loss1, in_axes=(0, 0, 0)), ps, xs, 0),
    ):
        def train_step(p, x, k, _loss=loss):
            g = jax.grad(lambda pp: jnp.sum(_loss(pp, x, k)))(p)
            return jax.tree.map(lambda a, b: a - 1e-3 * b, p, g)

        keys = (
            jax.random.split(jax.random.PRNGKey(7), S)
            if kaxis == 0 else jax.random.PRNGKey(7)
        )

        @jax.jit
        def scan_steps(p, x, k, _step=train_step):
            def body(pp, _):
                return _step(pp, x, k), None
            pp, _ = jax.lax.scan(body, p, None, length=SCAN_STEPS)
            return pp

        def step(_p=params, _x=x, _k=keys):
            out = scan_steps(_p, _x, _k)
            float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

        ts = timed_reps(step, warmup=2, reps=5)
        results[name] = ts[len(ts) // 2] / SCAN_STEPS
        print(f"  {name}: {results[name]*1e6:.1f} us/step", flush=True)
    return results


def _probe_trainer():
    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.data.mnist import synthetic_mnist_arrays
    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.train import Trainer

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
    return trainer, dm, K, N_TRAIN, N_VAL, BS


def epoch_body_probe():
    """The PRODUCTION epoch bodies (epoch_program.build_epoch_fns:
    shuffle + 50x(fwd+bwd+Riemannian Adam+finite guard) train epoch, and
    the full-split eval fold), single lane vs vmapped x8, scanned 20
    epochs per dispatch. Together these are exactly what the chunk
    program scans — whichever body blows up under vmap owns the
    ensemble's device-time penalty."""
    trainer, dm, K, N_TRAIN, N_VAL, BS = _probe_trainer()
    trainer._epoch_fns(N_TRAIN, BS, N_VAL)
    train_body, eval_full = trainer._body_fns_cache[(N_TRAIN, BS, N_VAL)]
    xt, xv = trainer._stage(dm.x_train), trainer._stage(dm.x_val)

    def one_state(seed):
        p = trainer.init_params(dm.x_train, jax.random.PRNGKey(seed))
        return p, trainer._optimizer.init(p)

    p1, o1 = one_state(0)
    stacked = [one_state(s) for s in range(S)]
    ps = jax.tree.map(lambda *a: jnp.stack(a), *[s[0] for s in stacked])
    os_ = jax.tree.map(lambda *a: jnp.stack(a), *[s[1] for s in stacked])

    results = {}

    def scan_train(body, in_axes=None):
        fn = body if in_axes is None else jax.vmap(body, in_axes=in_axes)

        @jax.jit
        def run(p, o, key):
            def ep(carry, _):
                p, o, k = carry
                k, ek = jax.random.split(k)
                if in_axes is not None:
                    ek = jax.random.split(ek, S)
                p, o, _ = fn(p, o, xt, ek, None)
                return (p, o, k), None
            (p, o, _), _ = jax.lax.scan(ep, (p, o, key), None, length=K)
            return p, o
        return run

    def scan_eval(body, in_axes=None):
        fn = body if in_axes is None else jax.vmap(body, in_axes=in_axes)

        @jax.jit
        def run(p, key):
            def ep(carry, _):
                k = carry
                k, ek = jax.random.split(k)
                if in_axes is not None:
                    ek = jax.random.split(ek, S)
                m = fn(p, xv, ek, None)
                return k, m["loss_total"]
            _, losses = jax.lax.scan(ep, key, None, length=K)
            return losses
        return run

    arms = [
        ("trainbody_single", scan_train(train_body),
         lambda f: f(p1, o1, jax.random.PRNGKey(1))),
        ("trainbody_vmap", scan_train(train_body, (0, 0, None, 0, None)),
         lambda f: f(ps, os_, jax.random.PRNGKey(1))),
        ("evalfull_single", scan_eval(eval_full),
         lambda f: f(p1, jax.random.PRNGKey(2))),
        ("evalfull_vmap", scan_eval(eval_full, (0, None, 0, None)),
         lambda f: f(ps, jax.random.PRNGKey(2))),
    ]
    for name, fn, call in arms:
        def step(_fn=fn, _call=call):
            out = _call(_fn)
            float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

        ts = timed_reps(step, warmup=2, reps=5)
        results[name] = ts[len(ts) // 2] / K
        print(f"  {name}: {results[name]*1e3:.2f} ms/epoch", flush=True)
    return results


def chunk_arms():
    """Full production-chunk arms (the deciding numbers)."""
    import time

    from hyperbolic_vae_tpu.train.ensemble import _ens_chunk_fn, _stack

    trainer, dm, K, N_TRAIN, N_VAL, BS = _probe_trainer()
    xt, xv = trainer._stage(dm.x_train), trainer._stage(dm.x_val)

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

    results = {}

    def time_fn(make_args, fn, reps=3):
        args = make_args()
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out[3])[0]).ravel()[0])
        ts = []
        for _ in range(reps):
            args = make_args()
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(jax.tree.leaves(out[3])[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # sequential floor: one single-seed chunk x 8
    plain = trainer._chunk_fn(N_TRAIN, BS, N_VAL, K)
    p_host = jax.tree.map(
        np.asarray, trainer.init_params(dm.x_train, jax.random.PRNGKey(0))
    )

    def plain_args():
        p = jax.tree.map(jnp.asarray, p_host)
        return (p, trainer._optimizer.init(p), jax.tree.map(jnp.copy, p),
                trainer._init_ctrl(), xt, xv, jax.random.PRNGKey(0))

    t1 = time_fn(plain_args, plain)
    results["seq_chunk_s1"] = t1
    results["seq_sum_s8"] = 8 * t1
    print(f"  sequential chunk: {t1*1e3:.1f} ms -> x8 = {8*t1*1e3:.1f} ms", flush=True)

    fn = _ens_chunk_fn(trainer, N_TRAIN, BS, N_VAL, K, S)

    def vmap_args():
        st = states(S)
        return (*st[:4], xt, xv, st[4], None)

    results["vmap_full_s8"] = time_fn(vmap_args, fn)
    print(f"  vmap full S=8 (production, masked-skip): "
          f"{results['vmap_full_s8']*1e3:.1f} ms", flush=True)

    # the pre-round-5 ensemble body: the single-seed chunk (lax.cond
    # epoch skip) vmapped — under vmap the batched-predicate cond cannot
    # stay a branch; this arm measures what that costs
    from hyperbolic_vae_tpu.train.chunk_program import build_chunk_body

    train_body, eval_full = trainer._body_fns_cache[(N_TRAIN, BS, N_VAL)]
    cond_body = build_chunk_body(trainer, train_body, eval_full, K, masked_skip=False)
    cond_fn = jax.jit(
        jax.vmap(cond_body, in_axes=(0, 0, 0, 0, None, None, 0, None)),
        donate_argnums=(0, 1, 2),
    )
    results["vmap_condbody_s8"] = time_fn(vmap_args, cond_fn)
    print(f"  vmap cond-body S=8 (pre-round-5): "
          f"{results['vmap_condbody_s8']*1e3:.1f} ms", flush=True)

    # shared-key arm: key broadcast -> per-lane slicing collapses
    shared = jax.jit(
        jax.vmap(cond_body, in_axes=(0, 0, 0, 0, None, None, None, None)),
        donate_argnums=(0, 1, 2),
    )

    def shared_args():
        st = states(S)
        return (*st[:4], xt, xv, jax.random.PRNGKey(0), None)

    results["vmap_sharedkey_s8"] = time_fn(shared_args, shared)
    print(f"  vmap sharedkey S=8: {results['vmap_sharedkey_s8']*1e3:.1f} ms", flush=True)
    return results


def main():
    import os

    if os.environ.get("HVAE_FORCE_CPU"):  # smoke-test switch (timings meaningless)
        jax.config.update("jax_platforms", "cpu")
    out = {"config": {"S": S, "B": B, "widths": WIDTHS}}
    print("step-level Dense-stack probe (S=8, B=256):", flush=True)
    out["step_probe_sec"] = step_probe()
    print("real-model step probe:", flush=True)
    out["model_step_sec"] = model_step_probe()
    print("production epoch-body probe (20 epochs/dispatch):", flush=True)
    out["epoch_body_sec"] = epoch_body_probe()
    print("full-chunk arms (K=20):", flush=True)
    out["chunk_sec"] = chunk_arms()

    sp = out["step_probe_sec"]
    ch = out["chunk_sec"]
    out["attribution"] = {
        "vmap_vs_seq_device_ratio": ch["vmap_full_s8"] / ch["seq_sum_s8"],
        "condbody_vs_seq_device_ratio": ch["vmap_condbody_s8"] / ch["seq_sum_s8"],
        "masked_skip_speedup": ch["vmap_condbody_s8"] / ch["vmap_full_s8"],
        "slicing_share_of_vmap": 1.0 - ch["vmap_sharedkey_s8"] / ch["vmap_condbody_s8"],
        "fold_outconcat_vs_vmap_step": sp["fold_outconcat"] / sp["vmap_dense"],
        "fold_blockdiag_vs_vmap_step": sp["fold_blockdiag"] / sp["vmap_dense"],
        # per-lane-WEIGHTS penalty: batched matmuls vs one clean
        # (S*B, i) @ (i, o) matmul on the same activations
        "perlane_weights_penalty_step": sp["vmap_dense"] / sp["shared_dense"],
        # the Dense stack's own vmap-vs-sequential ratio (x8 single lanes)
        "dense_vmap_vs_seq_step": sp["vmap_dense"] / (8 * sp["single_lane"]),
        # the REAL model step's ratio — the manifold/VPU chain included
        "model_vmap_vs_seq_step": (
            out["model_step_sec"]["model_vmap"]
            / (8 * out["model_step_sec"]["model_single"])
        ),
        # the production bodies: whichever blows up owns the penalty
        "trainbody_vmap_vs_seq": (
            out["epoch_body_sec"]["trainbody_vmap"]
            / (8 * out["epoch_body_sec"]["trainbody_single"])
        ),
        "evalfull_vmap_vs_seq": (
            out["epoch_body_sec"]["evalfull_vmap"]
            / (8 * out["epoch_body_sec"]["evalfull_single"])
        ),
    }
    path = Path(__file__).parent / "ENSEMBLE_LAYOUT_AB.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out["attribution"], indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
