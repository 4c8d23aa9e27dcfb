"""Post-training evaluation paths (extracted from trainer.py in round
4): split metrics, the K-importance-weighted bound, latent probes, and
posterior-mean embedding. All take the Trainer as the composition
context (model, mesh, epoch-program cache, seed discipline).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyperbolic_vae_tpu.data.core import ArrayDataModule
from hyperbolic_vae_tpu.parallel.mesh import replicated


def evaluate(trainer, dm: ArrayDataModule, params, split: str = "test",
             stream_block_rows: Optional[int] = None) -> dict:
    """Mean loss metrics over a split. ``stream_block_rows`` evaluates
    host-resident splits larger than HBM in blocks (exact
    sample-count weighting; the per-block sample-RNG stream differs
    from the resident path's single stream, so MC metrics agree in
    distribution, not bitwise)."""
    hp_eval = None
    if trainer.hp_model_fn is not None:
        if not getattr(trainer, "_hp_schedule_single", False):
            # lane mode (with or without a composed schedule): per-lane
            # keys make any single rebuilt model wrong — use
            # evaluate_lanes, or a plain Trainer on the concrete model
            raise ValueError(
                "evaluate needs a concrete model; rebuild one from the "
                "lane's hparams with a plain Trainer (or evaluate_lanes)"
            )
        # scheduled single-model path (beta_schedule): evaluate at the
        # schedule's END state — after a completed warmup this is the
        # model's own configured value
        hp_eval = trainer.hp_schedule(jnp.asarray(trainer.max_epochs, jnp.int32))
    x_host = getattr(dm, f"x_{split}")
    n = int(x_host.shape[0])
    if stream_block_rows and stream_block_rows < n:
        m = int(stream_block_rows)
        key = jax.random.PRNGKey(trainer.seed + 1)
        acc, seen = None, 0
        for start in range(0, n, m):
            blk = np.asarray(x_host[start : start + m], np.float32)
            r = len(blk)
            _, eval_ep = trainer._epoch_fns(max(r, dm.batch_size), dm.batch_size, r)
            key, k = jax.random.split(key)
            ms = jax.device_get(eval_ep(params, trainer._stage(blk), k, hp_eval))
            acc = (
                {mk: float(v) * r for mk, v in ms.items()}
                if acc is None
                else {mk: acc[mk] + float(ms[mk]) * r for mk in acc}
            )
            seen += r
        return {f"{split}/{mk}": v / seen for mk, v in acc.items()}
    x = trainer._stage(x_host)
    _, eval_epoch = trainer._epoch_fns(
        max(n, dm.batch_size), dm.batch_size, n
    )
    ms = jax.device_get(
        eval_epoch(params, x, jax.random.PRNGKey(trainer.seed + 1), hp_eval)
    )
    return {f"{split}/{k}": float(v) for k, v in ms.items()}


def evaluate_iwae(trainer, dm: ArrayDataModule, params, k: int = 5000,
                  split: str = "test", batch_chunk: int = 256,
                  k_chunk: int = 500) -> float:
    """Mean K-importance-weighted log p(x) bound over a split — the
    reference's written follow-up ("report IWAE loss for each model
    on test set", vae_hyperbolic_gyroplane_decoder.py:37-40), for any
    model exposing ``iwae(x, k)`` (all VAE families; models/iwae.py).

    Memory-bounded two-axis chunking: the split streams in
    ``batch_chunk`` rows, K in ``k_chunk`` independent sample chunks
    recombined EXACTLY via logsumexp (combine_chunked_bounds) —
    K=5000 at any data width without a (K, B, D) materialization."""
    from hyperbolic_vae_tpu.models.iwae import combine_chunked_bounds

    if trainer.hp_model_fn is not None and not getattr(
        trainer, "_hp_schedule_single", False
    ):
        # lane mode (per-lane keys — the static model would be wrong).
        # The beta-sugar single-model path is fine with the static
        # model: the IWAE bound has no beta in it.
        raise ValueError(
            "evaluate_iwae needs a concrete model; rebuild one from "
            "the lane's hparams with a plain Trainer"
        )
    x_host = np.asarray(getattr(dm, f"x_{split}"), np.float32)
    ks = [k_chunk] * (k // k_chunk) + ([k % k_chunk] if k % k_chunk else [])
    fns = {}  # one compiled program per distinct k chunk size

    def fn_for(kc):
        if kc not in fns:
            fns[kc] = jax.jit(
                lambda p, xb, key: trainer.model.apply(
                    {"params": p}, xb, kc, method="iwae",
                    rngs={"sample": key},
                )
            )
        return fns[kc]

    key = jax.random.PRNGKey(trainer.seed + 2)
    total, n = 0.0, int(x_host.shape[0])
    for start in range(0, n, batch_chunk):
        xb = jnp.asarray(x_host[start : start + batch_chunk])
        bounds = []
        for kc in ks:
            key, sub = jax.random.split(key)
            bounds.append(fn_for(kc)(params, xb, sub))
        combined = combine_chunked_bounds(bounds, ks)
        total += float(jnp.sum(combined))
    return total / n


def evaluate_probe(trainer, dm: ArrayDataModule, params, k: int = 10,
                   train_split: str = "train", eval_split: str = "test",
                   max_train: int = 20000) -> dict:
    """Latent-space probe accuracies (probe.py): kNN + nearest
    Fréchet mean under the model's latent metric, on posterior-mean
    embeddings from the padded encode_split path. ``max_train``
    bounds the reference set (seeded subsample) so the distance
    blocks stay MXU-sized at MNIST scale."""
    from hyperbolic_vae_tpu.probe import knn_accuracy, nearest_mean_accuracy

    z_tr, y_tr = encode_split(trainer, dm, params, train_split)
    if len(z_tr) > max_train:
        idx = np.random.default_rng(trainer.seed).choice(
            len(z_tr), max_train, replace=False
        )
        z_tr, y_tr = z_tr[idx], np.asarray(y_tr)[idx]
    z_te, y_te = encode_split(trainer, dm, params, eval_split)
    ball = getattr(trainer.model, "ball", None)
    return {
        f"{eval_split}/probe_knn{k}_acc": float(
            knn_accuracy(z_tr, y_tr, z_te, y_te, ball=ball, k=k)
        ),
        f"{eval_split}/probe_nearest_mean_acc": float(
            nearest_mean_accuracy(z_tr, y_tr, z_te, y_te, ball=ball)
        ),
    }


def encode_split(trainer, dm: ArrayDataModule, params, split: str = "val",
                 batch_size: Optional[int] = None):
    """Posterior means for a split (for latent-space visualization).

    Runs through serve.Inferencer's padded fixed-batch path, so the
    memory high-water mark is one batch of activations — a 50k-row
    20k-gene split encodes without materializing a single giant
    apply. The Inferencer (and its compiled programs) is cached on
    the Trainer; params are swapped in per call."""
    if trainer.hp_model_fn is not None and not getattr(
        trainer, "_hp_schedule_single", False
    ):
        # lane mode: silently embedding lane params with the
        # REPRESENTATIVE model's curvature would be wrong for every
        # other lane (even when a schedule is composed over the lanes).
        # The beta-sugar single-model path encodes with the static
        # model — encode has no beta in it.
        raise ValueError(
            "encode_split needs a concrete model; rebuild one from "
            "the lane's hparams with a plain Trainer"
        )
    x = np.asarray(getattr(dm, f"x_{split}"), np.float32)
    bs = int(batch_size or dm.batch_size)
    if trainer.mesh is not None:
        # match Inferencer's rounding so the cache check agrees: the
        # serving batch must shard evenly over the 'data' axis even
        # when the TRAINING batch (gathered in-graph) need not
        n_data = trainer.mesh.shape["data"]
        bs = -(-bs // n_data) * n_data
    inf = getattr(trainer, "_encode_inferencer", None)
    if inf is None or inf.batch_size != bs:
        from hyperbolic_vae_tpu.serve import Inferencer

        inf = Inferencer(trainer.model, params, batch_size=bs, mesh=trainer.mesh)
        trainer._encode_inferencer = inf
    else:
        if trainer.mesh is not None:
            params = jax.device_put(params, replicated(trainer.mesh))
        inf.params = params
    mu = inf.embed(x)
    # keep the compiled programs cached but release the params (a
    # replicated copy under a mesh) — otherwise a one-off encode pins
    # a full parameter tree in HBM for the Trainer's lifetime
    inf.params = None
    return np.asarray(mu), np.asarray(getattr(dm, f"y_{split}"))
