"""Orbax checkpointing: best-on-monitor + last, self-describing.

Replaces Lightning ModelCheckpoint(top-1 on val/loss_total, save_last)
(/root/reference/hyperbolic_vae/training/trainer_mnist.py:22-27) and the
load-best-then-test consumption pattern (scripts/_5:51-52).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, monitor: str = "val/loss_total"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self._ckpt = ocp.StandardCheckpointer()

    def _save(self, name: str, params: Any, meta: dict) -> None:
        path = self.directory / name
        self._ckpt.save(path, params, force=True)
        with open(self.directory / f"{name}.json", "w") as f:
            json.dump({k: v for k, v in meta.items() if isinstance(v, (int, float, str))}, f)

    def save_best(self, epoch: int, params: Any, metrics: dict) -> None:
        self._save("best", params, {"epoch": epoch, **metrics})

    def save_last(self, epoch: int, params: Any, metrics: dict) -> None:
        self._save("last", params, {"epoch": epoch, **metrics})

    def restore(self, name: str = "best", like: Optional[Any] = None) -> Any:
        path = self.directory / name
        if like is not None:
            return self._ckpt.restore(path, target=jax.tree.map(lambda x: x, like))
        return self._ckpt.restore(path)

    def best_metadata(self) -> Optional[dict]:
        p = self.directory / "best.json"
        return json.loads(p.read_text()) if p.exists() else None

    # ---- full training state (params + opt state + controllers) ----
    # the resume unit the reference delegates to Lightning (SURVEY 5.4):
    # weights, optimizer moments, epoch, RNG, and scheduler state.

    def save_state(self, state: Any, meta: dict) -> None:
        path = self.directory / "state"
        self._ckpt.save(path, state, force=True)
        with open(self.directory / "state.json", "w") as f:
            json.dump(meta, f)

    def restore_state(self, like: Any) -> tuple[Any, Optional[dict]]:
        path = self.directory / "state"
        meta_path = self.directory / "state.json"
        if not path.exists():
            return None, None
        state = self._ckpt.restore(path, target=like)
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        return state, meta

    def has_state(self) -> bool:
        return (self.directory / "state").exists()
