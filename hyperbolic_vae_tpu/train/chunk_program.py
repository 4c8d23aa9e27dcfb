"""The K-epochs-per-dispatch chunk program and its in-graph controller
state (extracted from trainer.py in round 4).

One dispatch runs K epochs of (train scan + full val eval + best-params
tracking + ReduceLROnPlateau + EarlyStopping) INSIDE the compiled
program with exact K=1 host semantics — histories are bit-identical to
the K=1 loop for any K (tests/test_chunked_fit.py). The host's job per
chunk is logging, checkpointing and callback dispatch only.

``build_chunk_body`` returns the UNJITTED chunk callable; the Trainer
jits it (with donation) and caches both, and train/ensemble.py vmaps
the body over a leading seed/lane axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ctrl(trainer, start_epoch: int = 0) -> dict:
    """In-graph controller + best-tracking state for the chunk program
    (fields mirror optim/schedules.py; seeded from the possibly-resumed
    host controller mirrors)."""
    return {
        "best_val": jnp.asarray(jnp.inf, jnp.float32),
        "best_epoch": jnp.asarray(-1, jnp.int32),
        "epoch": jnp.asarray(start_epoch, jnp.int32),
        "pl_lr": jnp.asarray(trainer.plateau.lr, jnp.float32),
        "pl_best": jnp.asarray(trainer.plateau.best, jnp.float32),
        "pl_bad": jnp.asarray(trainer.plateau.num_bad_epochs, jnp.int32),
        "es_best": jnp.asarray(
            trainer.early_stopping.best if trainer.early_stopping else jnp.inf,
            jnp.float32,
        ),
        "es_wait": jnp.asarray(
            trainer.early_stopping.wait if trainer.early_stopping else 0, jnp.int32
        ),
        "stopped": jnp.asarray(False),
    }


def build_chunk_body(trainer, train_body, eval_full, k: int,
                     masked_skip: bool = False):
    """The unjitted K-epoch chunk program over the shared epoch-body
    contract (epoch_program.build_epoch_fns' ``train_body``/``eval_full``).

    After an in-graph stop the epoch counter freezes, which is how the
    host learns how many epochs actually ran; metric rows for skipped
    epochs are NaN. ``ctrl`` is the dict from init_ctrl, threaded
    through chunks.

    Two skip mechanisms, bit-identical in VALUES (pinned by
    tests/test_ensemble.py::test_masked_skip_body_bitmatches_cond_body),
    different in cost model:

    ``masked_skip=True`` (the production default — Trainer._chunk_fn
    AND the vmapped ensemble) runs the epoch unconditionally and masks
    the outputs with ``where(active, ...)``; stopped epochs pay their
    FLOPs (bounded: the host loop exits after the stopping chunk).
    Chosen on measurement twice over: for vmapped lanes a
    batched-predicate cond cannot lower to a real branch (both branches
    execute + per-lane select; the cond cost ~5x the bodies it guarded,
    ENSEMBLE_LAYOUT_AB.json), and for single-seed chunks the scalar
    HLO conditional inside the epoch scan still cost +5.0 ms/epoch on
    the b256 flagship — ~50% of the epoch it wrapped
    (TRAINER_OVERHEAD_AB2.json, round 5).

    ``masked_skip=False`` wraps the epoch in a scalar lax.cond — no
    FLOPs after a stop. Useful when K is large relative to the
    expected stop epoch and the per-epoch conditional tax is
    acceptable (not the measured trade on this backend).
    """
    # the in-graph controllers/best tracking read the monitored metric
    # from the chunk's own metric folds: val/* from the eval fold, or
    # train/* from the train-epoch means (the deleted K=1 host loop read
    # metrics.get(monitor) off the combined dict, which supported both)
    mon_src, _, monitor_key = trainer.monitor.partition("/")
    if mon_src not in ("val", "train") or not monitor_key:
        raise ValueError(
            "resident fits monitor an in-graph metric fold — monitor must "
            f"be 'val/<metric>' or 'train/<metric>', got {trainer.monitor!r}"
        )
    pl_factor = trainer._plateau_cfg["factor"]
    pl_patience = trainer._plateau_cfg["patience"]
    pl_min_lr = trainer._plateau_cfg["min_lr"]
    pl_threshold = trainer.plateau.threshold
    es_enabled = trainer._early_patience is not None
    es_patience = trainer._early_patience or 0
    es_min_delta = trainer.early_stopping.min_delta if es_enabled else 0.0
    lr_schedule = trainer.lr_schedule
    hp_schedule = trainer.hp_schedule

    def chunk(params, opt_state, best_params, ctrl, x_train, x_val, key, hp=None):
        def hp_at(epoch, static_hp):
            """Merge the epoch-indexed schedule over the static/per-lane
            hp dict (scheduled keys win; same f32 callable as the K=1
            host loop, so chunked histories stay bit-identical)."""
            if hp_schedule is None:
                return static_hp
            return {**(static_hp or {}), **hp_schedule(epoch)}

        # shapes don't depend on the schedule's values; a fixed-epoch
        # evaluation gives eval_shape the right hp structure
        hp0 = hp_at(jnp.zeros((), jnp.int32), hp)
        # abstract-eval (no FLOPs) the metric pytree structures so the
        # skip branch of the cond can emit NaN rows of matching shape
        tms_shape = jax.eval_shape(
            lambda p, o, kk: train_body(p, o, x_train, kk, hp0)[2], params, opt_state, key
        )
        vms_shape = jax.eval_shape(lambda p, kk: eval_full(p, x_val, kk, hp0), params, key)
        nan_of = lambda tree: jax.tree.map(
            lambda s: jnp.full(s.shape, jnp.nan, s.dtype), tree
        )

        def body(carry, _):
            params, opt_state, best_params, ctrl, key = carry
            key, ek, vk = jax.random.split(key, 3)  # same order as fit()
            active = ~ctrl["stopped"]
            # deterministic schedule (epoch-indexed, in-graph) takes
            # precedence over the plateau controller's lr
            if lr_schedule is not None:
                lr_used = lr_schedule(ctrl["epoch"])
            else:
                lr_used = ctrl["pl_lr"]

            hp_epoch = hp_at(ctrl["epoch"], hp)

            def do_epoch(args):
                params, opt_state, ek, vk, lr = args
                # in-graph LR injection: same mechanism as the K=1
                # loop's host-side hyperparams write, but per-epoch
                opt_state = opt_state._replace(
                    hyperparams=dict(opt_state.hyperparams, learning_rate=lr)
                )
                params, opt_state, tms = train_body(
                    params, opt_state, x_train, ek, hp_epoch
                )
                vms = eval_full(params, x_val, vk, hp_epoch)
                return params, opt_state, tms, vms

            def skip_epoch(args):
                params, opt_state, *_ = args
                return params, opt_state, nan_of(tms_shape), nan_of(vms_shape)

            if masked_skip:
                # unconditional epoch + output masking: identical values
                # (the cond's do-branch computes exactly these), chosen
                # for vmapped lanes where the batched cond is the cost
                new_p, new_o, tms, vms = do_epoch(
                    (params, opt_state, ek, vk, lr_used)
                )
                params = jax.tree.map(
                    lambda n, o: jnp.where(active, n, o), new_p, params
                )
                opt_state = jax.tree.map(
                    lambda n, o: jnp.where(active, n, o), new_o, opt_state
                )
                tms = jax.tree.map(
                    lambda v, s: jnp.where(active, v, jnp.full(s.shape, jnp.nan, s.dtype)),
                    tms, tms_shape,
                )
                vms = jax.tree.map(
                    lambda v, s: jnp.where(active, v, jnp.full(s.shape, jnp.nan, s.dtype)),
                    vms, vms_shape,
                )
            else:
                params, opt_state, tms, vms = jax.lax.cond(
                    active, do_epoch, skip_epoch, (params, opt_state, ek, vk, lr_used)
                )

            # f32: the ctrl carry is f32 (host-mirror parity); an f64
            # monitored metric (drift-anchor leg) must not widen it
            mon = (tms if mon_src == "train" else vms)[monitor_key].astype(
                jnp.float32
            )
            finite = jnp.isfinite(mon) & active
            # best-model tracking (mirrors the K=1 host loop)
            better = finite & (mon < ctrl["best_val"])
            best_params = jax.tree.map(
                lambda b, p: jnp.where(better, p, b), best_params, params
            )
            ctrl = dict(ctrl)
            ctrl["best_val"] = jnp.where(better, mon, ctrl["best_val"])
            ctrl["best_epoch"] = jnp.where(better, ctrl["epoch"], ctrl["best_epoch"])
            # ReduceLROnPlateau (torch rel-threshold min semantics)
            improved = mon < ctrl["pl_best"] * (1.0 - pl_threshold)
            pl_best = jnp.where(improved, mon, ctrl["pl_best"])
            pl_bad = jnp.where(improved, 0, ctrl["pl_bad"] + 1)
            trip = pl_bad > pl_patience
            # reductions only (torch eps-guard): a per-lane lr below
            # min_lr must never be RAISED to min_lr on a trip
            pl_cand = jnp.maximum(ctrl["pl_lr"] * pl_factor, pl_min_lr)
            pl_lr = jnp.where(
                trip & (pl_cand < ctrl["pl_lr"]), pl_cand, ctrl["pl_lr"]
            )
            pl_bad = jnp.where(trip, 0, pl_bad)
            # controllers only step on finite monitors (K=1 parity)
            ctrl["pl_best"] = jnp.where(finite, pl_best, ctrl["pl_best"])
            ctrl["pl_bad"] = jnp.where(finite, pl_bad, ctrl["pl_bad"])
            ctrl["pl_lr"] = jnp.where(finite, pl_lr, ctrl["pl_lr"])
            if es_enabled:
                es_improved = mon < ctrl["es_best"] - es_min_delta
                es_best = jnp.where(es_improved, mon, ctrl["es_best"])
                es_wait = jnp.where(es_improved, 0, ctrl["es_wait"] + 1)
                ctrl["es_best"] = jnp.where(finite, es_best, ctrl["es_best"])
                ctrl["es_wait"] = jnp.where(finite, es_wait, ctrl["es_wait"])
                ctrl["stopped"] = ctrl["stopped"] | (
                    finite & (es_wait >= es_patience)
                )
            # the stop epoch itself counts as run (K=1 records it)
            ctrl["epoch"] = ctrl["epoch"] + jnp.where(active, 1, 0)
            return (params, opt_state, best_params, ctrl, key), (tms, vms, lr_used)

        carry, ys = jax.lax.scan(
            body, (params, opt_state, best_params, ctrl, key), None, length=k
        )
        return carry + ys

    return chunk
