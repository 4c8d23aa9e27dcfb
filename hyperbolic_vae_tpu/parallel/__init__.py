from hyperbolic_vae_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SEED_AXIS,
    data_sharding,
    make_mesh,
    make_seed_mesh,
    replicated,
    seed_sharding,
    shard_batch,
)
from hyperbolic_vae_tpu.parallel.sharding_rules import (
    fsdp_param_shardings,
    fsdp_tp_param_shardings,
    opt_state_shardings,
    tp_param_shardings,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "SEED_AXIS",
    "make_mesh",
    "make_seed_mesh",
    "data_sharding",
    "seed_sharding",
    "replicated",
    "shard_batch",
    "tp_param_shardings",
    "fsdp_param_shardings",
    "fsdp_tp_param_shardings",
    "opt_state_shardings",
]
