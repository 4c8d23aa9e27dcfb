"""Parameter sharding rules for tensor parallelism.

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
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperbolic_vae_tpu.parallel.mesh import MODEL_AXIS


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
