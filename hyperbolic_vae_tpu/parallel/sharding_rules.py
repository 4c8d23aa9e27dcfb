"""Parameter sharding rules: tensor parallelism + FSDP.

The models here are small MLPs/convs, so the one place tensor
parallelism earns its keep is the RNA-seq family's wide Dense layers
((B, ~20k genes) x (genes, hidden)). Rules map flax param paths to
PartitionSpecs over the ('data', 'model') mesh:

  * encoder kernel  (genes, hidden)  -> shard hidden over 'model'
  * gyroplane points (planes, latent) -> shard planes over 'model'
    (each device computes distances to its plane shard)
  * decoder out kernel (hidden, genes) -> shard hidden (contraction dim)
    over 'model' -> XLA inserts the psum/reduce-scatter

Everything unmatched is replicated. jit propagates the intermediate
shardings from these parameter annotations.

FSDP (``fsdp_param_shardings``) is the orthogonal mode: weights, grads
and Adam moments sharded over the *data* axis (ZeRO-3 / "fully-sharded
data parallel" in the GSPMD formulation — shard the largest divisible
axis of every big leaf over 'data' and let XLA insert the per-layer
all-gathers and grad reduce-scatters). It composes with TP
(``fsdp_tp_param_shardings``: 'model' per the TP rules AND a remaining
free axis over 'data'), giving the full 2-D weight-sharded layout.
The win is state memory: per-device params+moments shrink ~n_data×,
which is what bounds the 20k-gene family at scale (BASELINE.md HBM
budget), while the batch stays sharded over 'data' exactly as in DP.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperbolic_vae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _spec_for(path: tuple, leaf) -> P:
    names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
    joined = "/".join(names)
    if "enc" in joined and names[-1] == "kernel":
        return P(None, MODEL_AXIS)
    if "enc" in joined and names[-1] == "bias":
        return P(MODEL_AXIS)
    if names[-1] == "mp_points":
        return P(MODEL_AXIS, None)
    if "gyroplanes" in joined and names[-1] == "bias":
        return P(MODEL_AXIS)
    if "dec_out" in joined and names[-1] == "kernel":
        return P(MODEL_AXIS, None)
    return P()


def tp_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for a (data, model) mesh."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = [NamedSharding(mesh, _spec_for(path, leaf)) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


# --------------------------------------------------------------------- #
# FSDP

# Below this many elements a leaf is replicated: all-gathering a tiny
# bias costs more (latency + a fusion break) than its shard saves.
FSDP_MIN_LEAF_ELEMS = 8192


def _fsdp_axis(shape, taken, n: int):
    """Largest axis divisible by n and not already sharded; None if none."""
    free = [(d, i) for i, d in enumerate(shape) if i not in taken and d % n == 0]
    return max(free)[1] if free else None


def fsdp_param_shardings(params, mesh: Mesh, min_leaf_elems: int = FSDP_MIN_LEAF_ELEMS):
    """ZeRO-3-style shardings: every big leaf split over 'data'.

    Pass as ``Trainer(param_sharding_fn=fsdp_param_shardings)``. Batch
    stays sharded over 'data' (same as DP); XLA's SPMD partitioner
    inserts the forward/backward all-gathers and the grad
    reduce-scatters. The Trainer places the Adam moments with their
    params' shardings (opt_state_shardings below), so the full training
    state is n_data-way sharded.
    """
    n = mesh.shape[DATA_AXIS]

    def spec_for(leaf) -> P:
        if n == 1 or int(np.prod(leaf.shape)) < min_leaf_elems:
            return P()
        ax = _fsdp_axis(leaf.shape, taken=(), n=n)
        if ax is None:
            return P()
        spec = [None] * leaf.ndim
        spec[ax] = DATA_AXIS
        return P(*spec)

    return jax.tree.map(lambda l: NamedSharding(mesh, spec_for(l)), params)


def fsdp_tp_param_shardings(params, mesh: Mesh, min_leaf_elems: int = FSDP_MIN_LEAF_ELEMS):
    """2-D weight sharding: 'model' per the TP rules, then the largest
    still-free divisible axis of every big leaf over 'data'."""
    n = mesh.shape[DATA_AXIS]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for path, leaf in flat:
        tp = list(_spec_for(path, leaf))
        tp += [None] * (leaf.ndim - len(tp))
        if n > 1 and int(np.prod(leaf.shape)) >= min_leaf_elems:
            taken = tuple(i for i, s in enumerate(tp) if s is not None)
            ax = _fsdp_axis(leaf.shape, taken, n)
            if ax is not None:
                tp[ax] = DATA_AXIS
        shardings.append(NamedSharding(mesh, P(*tp)))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def opt_state_shardings(optimizer, opt_state, params, mesh: Mesh):
    """Sharding pytree for an optimizer state: moment trees (anything
    param-shaped, via optax.tree_map_params) inherit each param's actual
    sharding; scalars/hyperparams are replicated. This is what makes
    FSDP actually shard the optimizer state (and TP stop replicating
    the model-sharded kernels' moments)."""
    import optax

    repl = NamedSharding(mesh, P())
    param_sh = jax.tree.map(
        lambda p: p.sharding if hasattr(p, "sharding") else repl, params
    )
    return optax.tree_map_params(
        optimizer,
        lambda _, s: s,
        opt_state,
        param_sh,
        transform_non_params=lambda _: repl,
    )
