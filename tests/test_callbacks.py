"""Visualization callbacks produce image artifacts."""

from pathlib import Path

import numpy as np

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import (
    GenerateCallback,
    LatentGridCallback,
    LatentScatterCallback,
    Trainer,
)

import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (fast tier)


def test_callbacks_write_pngs(tmp_path):
    dm = make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model,
        max_epochs=2,
        early_stopping_patience=None,
        log_dir=str(tmp_path),
        callbacks=[
            GenerateCallback(every_n_epochs=2),
            LatentScatterCallback(every_n_epochs=2),
            LatentGridCallback(every_n_epochs=2),
        ],
    )
    trainer.fit(dm)
    pngs = list(Path(tmp_path).glob("*.png"))
    names = {p.name.rsplit("_", 1)[0] for p in pngs}
    assert "reconstructions" in names, pngs
    assert "posterior_means" in names, pngs
    assert "latent_grid" in names, pngs
    # metrics JSONL also written
    assert (Path(tmp_path) / "metrics.jsonl").exists()
