"""Path constants (reference hyperbolic_vae/config.py:4-6)."""

from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parent.parent.parent
DATA_PATH = PROJECT_ROOT / "data"
CHECKPOINTS_PATH = PROJECT_ROOT / "checkpoints"
RUNS_PATH = PROJECT_ROOT / "runs"
