from hyperbolic_vae_tpu.ops.gyroplane import (
    gyroplane_distances,
    gyroplane_distances_fast,
    gyroplane_distances_pallas,
)

__all__ = [
    "gyroplane_distances",
    "gyroplane_distances_fast",
    "gyroplane_distances_pallas",
]
