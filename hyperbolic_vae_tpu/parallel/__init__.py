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
]
