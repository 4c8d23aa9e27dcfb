"""Orbax checkpointing: best-on-monitor + last, self-describing.

Replaces Lightning ModelCheckpoint(top-1 on val/loss_total, save_last)
(/root/reference/hyperbolic_vae/training/trainer_mnist.py:22-27) and the
load-best-then-test consumption pattern (scripts/_5:51-52).
"""

from __future__ import annotations

import dataclasses
import importlib
import json
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def model_hparams(model) -> Optional[dict]:
    """Constructor hyperparameters + class identity of a flax-module model,
    JSON-serializable — the rebuild of Lightning's ``save_hyperparameters()``
    (/root/reference/hyperbolic_vae/models/vae_hyperbolic.py:145-153), so a
    checkpoint alone is enough to reconstruct the experiment."""
    if not dataclasses.is_dataclass(model):
        return None
    out = {
        "__model_class__": type(model).__name__,
        "__model_module__": type(model).__module__,
    }
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name"):
            continue
        v = getattr(model, f.name)
        if isinstance(v, tuple):
            v = list(v)
        if not isinstance(v, (int, float, str, bool, list, type(None))):
            return None  # non-serializable field: checkpoint stays params-only
        out[f.name] = v
    return out


def build_model(config: dict):
    """Inverse of :func:`model_hparams`: import the class and instantiate it
    with the saved constructor arguments (Lightning's ``load_from_checkpoint``
    model-rebuild half, /root/reference/scripts/_5_train_vae_hyperbolic_mnist.py:51-52)."""
    config = dict(config)
    module = importlib.import_module(config.pop("__model_module__"))
    cls = getattr(module, config.pop("__model_class__"))
    kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in config.items()}
    return cls(**kwargs)


def restore_model(ckpt_dir: str, name: str = "best"):
    """(model, params, meta) from a self-describing checkpoint directory —
    works for ANY model family saved by the Trainer, no CLI reconstruction."""
    mgr = CheckpointManager(ckpt_dir)
    meta = mgr.metadata(name)
    if meta is None or "model" not in meta:
        raise ValueError(
            f"{ckpt_dir}/{name}.json has no embedded model config; "
            "was it saved by a Trainer built around a flax-module model?"
        )
    model = build_model(meta["model"])
    params = mgr.restore(name)
    return model, params, meta


class CheckpointManager:
    def __init__(self, directory: str, monitor: str = "val/loss_total"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self._ckpt = ocp.StandardCheckpointer()
        # set by the Trainer: embedded in every best/last metadata file
        self.model_config: Optional[dict] = None

    def _save(self, name: str, params: Any, meta: dict) -> None:
        path = self.directory / name
        self._ckpt.save(path, params, force=True)
        payload = {k: v for k, v in meta.items() if isinstance(v, (int, float, str))}
        if self.model_config is not None:
            payload["model"] = self.model_config
        with open(self.directory / f"{name}.json", "w") as f:
            json.dump(payload, f)

    def save_best(self, epoch: int, params: Any, metrics: dict) -> None:
        self._save("best", params, {"epoch": epoch, **metrics})

    def save_last(self, epoch: int, params: Any, metrics: dict) -> None:
        self._save("last", params, {"epoch": epoch, **metrics})

    def save_named(self, name: str, params: Any, meta: dict) -> None:
        """A param checkpoint under any name (e.g. 'ema'), self-describing
        like best/last — restore_model(dir, name) rebuilds and loads it."""
        self._save(name, params, meta)

    def wait_until_finished(self) -> None:
        """Block until in-flight saves are committed. StandardCheckpointer
        is an AsyncCheckpointer: ``save()`` returns with the array write
        still in a background thread, so anything that reads the directory
        (restore, copying a run dir, process exit) must barrier first."""
        self._ckpt.wait_until_finished()

    def restore(self, name: str = "best", like: Optional[Any] = None) -> Any:
        self.wait_until_finished()
        path = self.directory / name
        if like is not None:
            return self._ckpt.restore(path, target=jax.tree.map(lambda x: x, like))
        return self._ckpt.restore(path)

    def metadata(self, name: str) -> Optional[dict]:
        p = self.directory / f"{name}.json"
        return json.loads(p.read_text()) if p.exists() else None

    def best_metadata(self) -> Optional[dict]:
        return self.metadata("best")

    # ---- full training state (params + opt state + controllers) ----
    # the resume unit the reference delegates to Lightning (SURVEY 5.4):
    # weights, optimizer moments, epoch, RNG, and scheduler state.

    def save_state(self, state: Any, meta: dict, name: str = "state") -> None:
        # ``name``: distinct state units coexist in one run dir — "state"
        # is the single-fit resume unit, "ensemble_state" the stacked
        # (S, ...) multi-seed/lane unit (train/ensemble.py, round 5)
        path = self.directory / name
        self._ckpt.save(path, state, force=True)
        with open(self.directory / f"{name}.json", "w") as f:
            json.dump(meta, f)

    def restore_state(self, like: Any, name: str = "state") -> tuple[Any, Optional[dict]]:
        self.wait_until_finished()
        path = self.directory / name
        meta_path = self.directory / f"{name}.json"
        if not path.exists():
            return None, None
        state = self._ckpt.restore(path, target=like)
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        return state, meta

    def has_state(self, name: str = "state") -> bool:
        self.wait_until_finished()
        return (self.directory / name).exists()
