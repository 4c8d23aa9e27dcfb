from hyperbolic_vae_tpu.utils.config import (
    CHECKPOINTS_PATH,
    DATA_PATH,
    PROJECT_ROOT,
    RUNS_PATH,
)
from hyperbolic_vae_tpu.utils.logging import ColoredFormatter, configure_handler_for_script

__all__ = [
    "PROJECT_ROOT",
    "DATA_PATH",
    "CHECKPOINTS_PATH",
    "RUNS_PATH",
    "ColoredFormatter",
    "configure_handler_for_script",
]
