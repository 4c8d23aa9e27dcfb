"""Riemannian Adam as an optax gradient transformation.

Replaces ``geoopt.optim.RiemannianAdam`` (the reference's optimizer for
every hyperbolic model, e.g.
/root/reference/hyperbolic_vae/models/vae_one_b.py:269-274). Per-leaf
behavior:

  * Euclidean leaves: exactly optax Adam (with bias correction).
  * Manifold leaves (flax param name starting with ``mp_``, i.e. points
    on the Poincare ball):
      1. riemannian gradient  g_r = egrad / lambda_x^2
      2. exp_avg    <- b1 * exp_avg    + (1-b1) * g_r
      3. exp_avg_sq <- b2 * exp_avg_sq + (1-b2) * lambda_x^2 * g_r^2
         (geoopt's ``component_inner`` second moment)
      4. direction = exp_avg_hat / (sqrt(exp_avg_sq_hat) + eps)
      5. new_point = expmap_x(-lr * direction)   (exact retraction)
      6. exp_avg <- parallel transport of exp_avg from x to new_point
      7. project new_point into the ball (geoopt's ``stabilize``)

This is NOT a translation of geoopt's CUDA/torch loop: the whole update
is a pure pytree map under jit, so XLA fuses the moment updates with the
expmap/transport math into one kernel per parameter.

Because the update needs the CURRENT PARAMS (expmap base point) and optax
updates are param-free by default, ``update(grads, state, params)``
requires params (like optax's weight-decay transforms). For manifold
leaves the returned update is the DELTA ``new_point - p``, so plain
``optax.apply_updates`` lands exactly on the retracted point — no custom
apply function is needed (train/trainer.py applies it that way).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.nn.layers import MANIFOLD_PARAM_PREFIX


class RiemannianAdamState(NamedTuple):
    count: jax.Array
    exp_avg: Any
    exp_avg_sq: Any
    # Polyak/EMA of the PARAMETERS (not the updates), tracked inside the
    # optimizer state so checkpoints/resume/donation/FSDP sharding all
    # handle it with zero extra plumbing. ``()`` (no leaves) when off.
    ema: Any = ()


def manifold_label_tree(params) -> Any:
    """Pytree of booleans: True where the leaf is a manifold point.

    Detection is by flax param name convention (``mp_`` prefix anywhere
    in the path), the static equivalent of geoopt's ManifoldParameter.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    labels = []
    for path, _ in flat:
        is_manifold = any(
            str(getattr(k, "key", getattr(k, "name", k))).startswith(MANIFOLD_PARAM_PREFIX)
            for k in path
        )
        labels.append(is_manifold)
    return jax.tree_util.tree_unflatten(treedef, labels)


def riemannian_adam(
    learning_rate: float | optax.Schedule = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    ball: Optional[PoincareBall] = None,
    weight_decay: float = 0.0,
    moment_dtype: Optional[Any] = None,
    ema_decay: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the transformation. ``ball`` is the manifold for every
    manifold-tagged leaf (all reference models share one ball).

    ``moment_dtype``: storage dtype for BOTH Adam moments, independent of
    the parameter dtype (default: follow each leaf's dtype). Setting
    ``'bfloat16'`` with f32 params halves the moment HBM stream — the
    read+write of exp_avg/exp_avg_sq every step, 4 of the 12 weight-class
    array passes at the RNA-seq realistic config (BASELINE.md roofline) —
    while keeping full-precision master weights. All moment arithmetic is
    still f32; only the stored copy is narrowed.

    ``ema_decay``: when set, track an exponential moving average of the
    parameters (Polyak averaging) in ``state.ema``, initialized at the
    init params (no debiasing needed). Euclidean leaves average
    linearly; manifold leaves average in the tangent space at the
    origin (logmap0 → lerp → expmap0 → project), which keeps the EMA
    exactly on the ball and matches how the layers themselves
    parameterize points (nn/layers.py expmap0 reparameterization).
    Extract with ``ema_params(opt_state)``. The EMA is computed from
    the exact post-apply params (p + update in the stored dtype, the
    same arithmetic optax.apply_updates performs) and STORED IN f32
    regardless of the parameter dtype: with bf16 parameter storage the
    per-step increment ((1-d) of the gap) would round to zero against
    bf16's ~0.39% relative resolution and the EMA would silently freeze.
    """

    ball = ball or PoincareBall(c=1.0)

    def _moment_zeros(p):
        return jnp.zeros(p.shape, moment_dtype or p.dtype)

    def init_fn(params):
        return RiemannianAdamState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree.map(_moment_zeros, params),
            exp_avg_sq=jax.tree.map(_moment_zeros, params),
            # a fresh f32 copy per leaf: (a) must not ALIAS the param
            # buffers (the trainer donates params and opt_state to the
            # same dispatch — an aliased leaf is a double donation);
            # (b) stored in f32 regardless of param dtype — with bf16
            # parameter storage a bf16 EMA increment (1-d of the gap,
            # e.g. 0.1%) rounds to ZERO against bf16's ~0.39% resolution
            # and the EMA silently freezes at init
            ema=(jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), params)
                 if ema_decay is not None else ()),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("riemannian_adam requires params in update()")
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        labels = manifold_label_tree(params)

        def leaf_update(is_manifold, g, p, m, v):
            # bf16-STORAGE support: leaves may be stored in bf16 (halving
            # the dominant HBM stream of wide layers — params + grads +
            # 2 moments read/written every step) while ALL optimizer
            # arithmetic stays f32; results are cast back to the stored
            # dtype on the way out. No-op for f32 leaves.
            stored = p.dtype
            m_stored = moment_dtype or stored
            # at LEAST f32: bf16/f16 storage upcasts, f32 is a no-op, and
            # f64 params (the multichip-drift anchor leg, __graft_entry__)
            # keep full width instead of being silently truncated
            compute_dt = jnp.promote_types(jnp.float32, p.dtype)
            g, p, m, v = (x.astype(compute_dt) for x in (g, p, m, v))
            if weight_decay:
                g = g + weight_decay * p
            if is_manifold:
                g = ball.egrad2rgrad(p, g)
                new_m = b1 * m + (1.0 - b1) * g
                new_v = b2 * v + (1.0 - b2) * ball.component_inner(p, g)
                direction = (new_m / bc1) / (jnp.sqrt(new_v / bc2) + eps)
                new_p, transported_m = ball.retr_transp(p, -lr * direction, new_m)
                new_p = ball.project(new_p)
                # "update" = new point minus old (apply adds it back);
                # exact because apply_updates does p + (new_p - p).
                return (
                    (new_p - p).astype(stored),
                    transported_m.astype(m_stored),
                    new_v.astype(m_stored),
                )
            new_m = b1 * m + (1.0 - b1) * g
            new_v = b2 * v + (1.0 - b2) * g * g
            update = -lr * (new_m / bc1) / (jnp.sqrt(new_v / bc2) + eps)
            return update.astype(stored), new_m.astype(m_stored), new_v.astype(m_stored)

        # tree.map over 5 aligned trees; labels is a prefix-compatible tree
        flat_updates = jax.tree.map(leaf_update, labels, grads, params, state.exp_avg, state.exp_avg_sq)
        updates = jax.tree.map(lambda t: t[0], flat_updates, is_leaf=lambda t: isinstance(t, tuple))
        new_m = jax.tree.map(lambda t: t[1], flat_updates, is_leaf=lambda t: isinstance(t, tuple))
        new_v = jax.tree.map(lambda t: t[2], flat_updates, is_leaf=lambda t: isinstance(t, tuple))

        if ema_decay is not None:
            d = jnp.float32(ema_decay)

            def ema_leaf(is_manifold, u, p, e):
                # exact post-apply point: p + u in the STORED dtype is the
                # same arithmetic optax.apply_updates performs, so the EMA
                # tracks the actual parameter trajectory bit-for-bit.
                # e is f32 master storage (see init_fn) — never narrowed.
                new_p = (p + u).astype(jnp.float32)
                if is_manifold:
                    t_new = ball.logmap0(new_p)
                    t_ema = ball.logmap0(e)
                    return ball.project(ball.expmap0(d * t_ema + (1.0 - d) * t_new))
                return d * e + (1.0 - d) * new_p

            new_ema = jax.tree.map(ema_leaf, labels, updates, params, state.ema)
        else:
            new_ema = ()
        return updates, RiemannianAdamState(
            count=count, exp_avg=new_m, exp_avg_sq=new_v, ema=new_ema
        )

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params(opt_state):
    """Extract the parameter EMA from a (possibly wrapped) optimizer
    state — works through inject_hyperparams / chain nesting. Raises if
    the optimizer was built without ``ema_decay``."""
    states = [
        s for s in jax.tree.leaves(
            opt_state, is_leaf=lambda x: isinstance(x, RiemannianAdamState)
        )
        if isinstance(s, RiemannianAdamState)
    ]
    if not states or (isinstance(states[0].ema, tuple) and states[0].ema == ()):
        raise ValueError(
            "no parameter EMA in this optimizer state — construct with "
            "riemannian_adam(ema_decay=...) / Trainer(ema_decay=...)"
        )
    return states[0].ema
