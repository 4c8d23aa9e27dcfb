"""Metric logging: JSONL always; TensorBoard when available.

Metric names keep the reference's ``train/ val/ test/`` namespacing
(e.g. ``val/loss_total``) for curve parity (SURVEY section 5.5).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Mapping, Optional

logger = logging.getLogger(__name__)


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir) if log_dir else None
        self._jsonl = None
        self._tb = None
        if self.log_dir:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=str(self.log_dir))
                except Exception:  # pragma: no cover - tb optional
                    logger.info("TensorBoard unavailable; JSONL metrics only")

    def log_scalars(self, step: int, scalars: Mapping[str, float]) -> None:
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, **{k: float(v) for k, v in scalars.items()}}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def log_image(self, step: int, tag: str, image) -> None:
        """image: (H, W, C) uint8/float array. Saved as PNG + TB."""
        import numpy as np

        if self.log_dir:
            from PIL import Image

            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            if arr.shape[-1] == 1:
                arr = arr[..., 0]
            Image.fromarray(arr).save(self.log_dir / f"{tag.replace('/', '_')}_{step:05d}.png")
        if self._tb:
            import numpy as np

            arr = np.asarray(image)
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            self._tb.add_image(tag, arr, step, dataformats="HWC")

    def log_hparams(self, hparams: Mapping) -> None:
        if self.log_dir:
            with open(self.log_dir / "hparams.json", "w") as f:
                json.dump({k: repr(v) for k, v in hparams.items()}, f, indent=2)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
