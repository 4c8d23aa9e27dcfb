from hyperbolic_vae_tpu.optim.riemannian_adam import (
    RiemannianAdamState,
    ema_params,
    manifold_label_tree,
    riemannian_adam,
)
from hyperbolic_vae_tpu.optim.schedules import (
    EarlyStopping,
    ReduceLROnPlateau,
    beta_warmup_schedule,
    cosine_schedule,
    exponential_schedule,
)

__all__ = [
    "riemannian_adam",
    "RiemannianAdamState",
    "ema_params",
    "manifold_label_tree",
    "ReduceLROnPlateau",
    "EarlyStopping",
    "beta_warmup_schedule",
    "cosine_schedule",
    "exponential_schedule",
]
