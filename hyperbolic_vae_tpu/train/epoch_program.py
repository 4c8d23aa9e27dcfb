"""The single-epoch compiled programs: one `lax.scan` over steps with
on-device shuffling, grad accumulation, clipping, the non-finite step
guard, and the split-exact eval fold (extracted from trainer.py in
round 4 — the Trainer composes these; semantics are pinned by the
bit-parity lattice in tests/test_chunked_fit.py, test_grad_accum.py,
test_grad_clip.py).

Contract: ``build_epoch_fns(trainer, n_train, batch_size, n_val)``
returns ``(train_epoch_jit, eval_epoch, train_body, eval_full)`` where

  * ``train_epoch_jit(params, opt_state, x_all, key)`` — the jitted
    whole-epoch training program (donates params/opt_state),
  * ``eval_epoch(params, x_all, key, hp=None)`` — host-callable
    full-split eval (jitted main scan + tail fold),
  * ``train_body`` / ``eval_full`` — the UNJITTED bodies with an extra
    trailing ``hp`` arg, the building blocks the chunk program
    (chunk_program.py) and vmapped ensembles (ensemble.py) trace inline.

Both bodies take ``hp`` (a dict of per-lane scalars) for
hyperparameter-lane sweeps; ``hp=None`` is the single-model path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.parallel.mesh import replicated


def build_epoch_fns(trainer, n_train: int, batch_size: int, n_val: int):
    steps = n_train // batch_size
    model = trainer.model
    hp_model_fn = trainer.hp_model_fn
    if hp_model_fn is not None:
        # hyperparameter-lane mode: model + optimizer are functions of
        # the per-lane scalar dict ``hp`` (traced under vmap)
        def loss_metrics(p, batch, key, hp):
            return hp_model_fn(hp).apply(
                {"params": p}, batch, method="loss", rngs={"sample": key}
            )

        def get_optimizer(hp):
            m = hp_model_fn(hp)
            return trainer._make_optimizer(
                getattr(m, "ball", None) or PoincareBall(c=1.0)
            )

    else:
        base_loss = trainer.loss_fn or (
            lambda p, batch, key: model.apply(
                {"params": p}, batch, method="loss", rngs={"sample": key}
            )
        )

        def loss_metrics(p, batch, key, hp):
            del hp
            return base_loss(p, batch, key)

        def get_optimizer(hp):
            del hp
            return trainer._optimizer

    shuffle = trainer.shuffle
    train_step_fn = trainer.train_step_fn
    grad_accum = trainer.grad_accum_steps
    grad_clip = trainer.grad_clip_norm
    finite_guard = getattr(trainer, "finite_guard", True)
    if grad_accum > 1 and batch_size % grad_accum:
        raise ValueError(
            f"batch_size {batch_size} not divisible by "
            f"grad_accum_steps {grad_accum}"
        )

    def grads_and_metrics(p, batch, sk, hp):
        """(loss, metrics, grads) for one optimizer step; with
        grad_accum>1 the batch is A equal microbatches scanned
        sequentially, grads/metrics accumulated in the carry (ONE
        microbatch of activations live at a time)."""
        if grad_accum == 1:
            def loss_fn(p_):
                m = loss_metrics(p_, batch, sk, hp)
                return m["loss_total"], m

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p)
            return loss, metrics, grads

        micro = batch.reshape(
            grad_accum, batch_size // grad_accum, *batch.shape[1:]
        )
        keys = jax.random.split(sk, grad_accum)
        m0 = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(loss_metrics, p, micro[0], keys[0], hp),
        )
        g0 = jax.tree.map(jnp.zeros_like, p)

        def micro_body(carry, xs):
            g_acc, m_acc = carry
            mb, mk = xs

            def loss_fn(p_):
                m = loss_metrics(p_, mb, mk, hp)
                return m["loss_total"], m

            (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            return (
                jax.tree.map(jnp.add, g_acc, g),
                jax.tree.map(jnp.add, m_acc, m),
            ), None

        (g_sum, m_sum), _ = jax.lax.scan(micro_body, (g0, m0), (micro, keys))
        # metric contract (CLAUDE.md conventions): every entry of
        # loss() is a PER-SAMPLE MEAN, so averaging over equal-size
        # microbatches is exact. A count/max-style metric would be
        # silently distorted here relative to grad_accum=1.
        inv = 1.0 / grad_accum
        metrics = jax.tree.map(lambda v: v * inv, m_sum)
        grads = jax.tree.map(lambda v: v * inv, g_sum)
        return metrics["loss_total"], metrics, grads

    def train_epoch(params, opt_state, x_all, key, hp=None):
        optimizer = get_optimizer(hp)
        perm_key, sample_key, off_key = jax.random.split(key, 3)
        if shuffle == "row":
            # exact reference semantics: fresh per-sample permutation.
            # int32 arange: under jax_enable_x64 (the drift-anchor
            # subprocess, __graft_entry__) the default would be int64
            # and draw a DIFFERENT schedule than the f32 legs.
            perm = jax.random.permutation(
                perm_key, jnp.arange(n_train, dtype=jnp.int32)
            )[: steps * batch_size]
            scan_xs = perm.reshape(steps, batch_size)
        else:
            # "block": each batch is a random contiguous window of the
            # (host-shuffled) dataset. Per-row gathers are DMA-latency
            # bound on TPU (~40ms/epoch at 60k x 784); one contiguous
            # dynamic_slice per step is ~2x faster end-to-end. Window
            # starts are uniform over [0, n-B], so batch composition
            # re-mixes every step/epoch.
            del off_key
            scan_xs = jax.random.randint(
                perm_key, (steps,), 0, n_train - batch_size + 1,
                dtype=jnp.int32,  # schedule must not depend on x64 mode
            )

        def step(carry, xs):
            params, opt_state, skey = carry
            skey, sk = jax.random.split(skey)
            if shuffle == "row":
                batch = jnp.take(x_all, xs, axis=0, mode="clip")  # in-bounds by construction; default "fill" gather miscompiles on some TPU backends
            else:
                batch = jax.lax.dynamic_slice_in_dim(x_all, xs, batch_size, axis=0)

            if train_step_fn is not None:
                params, opt_state, metrics = train_step_fn(params, opt_state, batch, sk)
                return (params, opt_state, skey), metrics

            loss, metrics, grads = grads_and_metrics(params, batch, sk, hp)
            if finite_guard or grad_clip is not None:
                gnorm = optax.global_norm(grads)
            if grad_clip is not None:
                # one shared scale (torch clip_grad_norm_ semantics);
                # a non-finite gnorm leaves grads non-finite and the
                # ok-guard below skips the step as before
                scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if finite_guard:
                # failure containment (SURVEY 5.2): a non-finite loss or
                # gradient skips the update instead of poisoning params —
                # the jit-world version of "probe_infnan then continue".
                # Trainer(finite_guard=False) drops this block (measured
                # 2.5 ms/epoch on the b256 flagship — the tiny-leaf
                # where-selects are serial VPU latency; values identical
                # while training stays finite, TRAINER_OVERHEAD_AB.json).
                ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
                new_params = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_params, params
                )
                new_opt_state = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state
                )
                skipped = 1.0 - ok.astype(jnp.float32)
            else:
                skipped = jnp.zeros((), jnp.float32)
            metrics = dict(metrics, skipped_steps=skipped)
            return (new_params, new_opt_state, skey), metrics

        (params, opt_state, _), ms = jax.lax.scan(
            step, (params, opt_state, sample_key), scan_xs
        )
        return params, opt_state, jax.tree.map(jnp.mean, ms)

    eval_batch = min(batch_size, n_val)
    eval_steps = max(n_val // eval_batch, 1)
    # the n_val % eval_batch tail is evaluated as its own (tiny) jitted
    # batch and folded in with an exact sample-count weighting, so the
    # monitored metric covers the FULL split like the reference's
    eval_rem = n_val - eval_steps * eval_batch

    def eval_scan(params, x_all, key, hp=None):
        idx = jnp.arange(eval_steps * eval_batch).reshape(eval_steps, eval_batch)

        def step(skey, batch_idx):
            skey, sk = jax.random.split(skey)
            batch = jnp.take(x_all, batch_idx, axis=0, mode="clip")
            m = loss_metrics(params, batch, sk, hp)
            return skey, m

        _, ms = jax.lax.scan(step, key, idx)
        return jax.tree.map(jnp.mean, ms)

    eval_scan_jit = jax.jit(eval_scan)
    eval_tail_jit = jax.jit(loss_metrics) if eval_rem else None
    mesh = trainer.mesh

    def eval_epoch(params, x_all, key, hp=None):
        k_main, k_tail = jax.random.split(key)
        ms = eval_scan_jit(params, x_all, k_main, hp)
        if eval_rem:
            start = eval_steps * eval_batch
            x_tail = x_all[start : start + eval_rem]
            if mesh is not None:
                x_tail = jax.device_put(x_tail, replicated(mesh))
            tm = eval_tail_jit(params, x_tail, k_tail, hp)
            w_main = (eval_steps * eval_batch) / n_val
            w_tail = eval_rem / n_val
            ms = jax.tree.map(lambda a, b: a * w_main + b * w_tail, ms, tm)
        return ms

    def eval_full(params, x_all, key, hp=None):
        """Fully in-graph eval incl. the tail fold — same math as
        eval_epoch (trace-safe for the chunked multi-epoch program)."""
        k_main, k_tail = jax.random.split(key)
        ms = eval_scan(params, x_all, k_main, hp)
        if eval_rem:
            start = eval_steps * eval_batch
            tm = loss_metrics(params, x_all[start : start + eval_rem], k_tail, hp)
            w_main = (eval_steps * eval_batch) / n_val
            w_tail = eval_rem / n_val
            ms = jax.tree.map(lambda a, b: a * w_main + b * w_tail, ms, tm)
        return ms

    donate = (0, 1)
    return (
        jax.jit(train_epoch, donate_argnums=donate),
        eval_epoch,
        train_epoch,
        eval_full,
    )
