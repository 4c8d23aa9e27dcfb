from hyperbolic_vae_tpu.train.callbacks import (
    GenerateCallback,
    LatentGridCallback,
    LatentInterpolationCallback,
    LatentScatterCallback,
)
from hyperbolic_vae_tpu.train.checkpoint import CheckpointManager, restore_model
from hyperbolic_vae_tpu.train.factories import make_trainer_hyperbolic
from hyperbolic_vae_tpu.train.metrics import MetricLogger
from hyperbolic_vae_tpu.train.preemption import GracefulShutdown
from hyperbolic_vae_tpu.train.trainer import Trainer, TrainResult

__all__ = [
    "Trainer",
    "TrainResult",
    "MetricLogger",
    "GracefulShutdown",
    "CheckpointManager",
    "restore_model",
    "make_trainer_hyperbolic",
    "GenerateCallback",
    "LatentScatterCallback",
    "LatentGridCallback",
    "LatentInterpolationCallback",
]
