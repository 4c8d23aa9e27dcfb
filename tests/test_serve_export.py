"""Exported serving bundles: jax.export StableHLO programs + params npz.

`Inferencer.export_programs` writes a self-contained deployment artifact;
`ExportedInferencer.load` serves it with no model class, no flax apply,
no retracing. Pinned here:

  * exported outputs match the live Inferencer bitwise on ragged request
    sizes (both run the same padded bucket programs),
  * the bundle round-trips params exactly (npz + manifest paths),
  * a fresh subprocess serves the bundle without constructing the model,
  * missing methods/buckets fail loudly.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.serve import ExportedInferencer, Inferencer
from hyperbolic_vae_tpu.train import Trainer

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    dm = make_data_module(batch_size=32, synthetic=True, n_train=128, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(model, max_epochs=1, early_stopping_patience=None, check_finite=False)
    params = trainer.init_params(dm.x_train)
    inf = Inferencer(model, params, batch_size=16, max_batches_per_dispatch=4)
    out = tmp_path_factory.mktemp("bundle")
    inf.export_programs(out)
    return inf, out, dm


def test_exported_matches_live(bundle):
    inf, out, dm = bundle
    exp = ExportedInferencer.load(out)
    for n in (1, 16, 17, 50):  # in-bucket, exact, ragged, multi-bucket
        x = np.asarray(dm.x_test[:n], np.float32)
        np.testing.assert_array_equal(exp.embed(x), inf.embed(x))
        np.testing.assert_array_equal(exp.reconstruct(x), inf.reconstruct(x))
    z = np.asarray(exp.embed(np.asarray(dm.x_test[:4], np.float32)))
    np.testing.assert_array_equal(exp.decode(z), inf.decode(z))


def test_exported_program_count_is_bounded(bundle):
    inf, out, _ = bundle
    # 3 methods x (buckets {1, 2, 4} + row buckets {1, 2, 4, 8}) = 21
    assert len(list(Path(out).glob("*.stablehlo"))) == 21
    exp = ExportedInferencer.load(out)
    with pytest.raises(KeyError, match="not exported"):
        exp._fn("loss")


def test_bf16_params_roundtrip_through_bundle(tmp_path):
    """np.savez cannot encode ml_dtypes bf16 (loads back as void '|V2');
    the bundle stores raw bytes + dtype in the manifest instead."""
    import jax.numpy as jnp

    from hyperbolic_vae_tpu.models import RNASeqVAE

    model = RNASeqVAE(in_features=64, hidden_dim=16, latent_dim=2,
                      param_dtype="bfloat16")
    x = np.random.default_rng(0).random((8, 64), np.float32)
    import jax

    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]
    inf = Inferencer(model, params, batch_size=8, max_batches_per_dispatch=2)
    inf.export_programs(tmp_path)  # data_shape derived from in_features
    exp = ExportedInferencer.load(tmp_path)
    flat_a = jax.tree.leaves(exp.params)
    flat_b = jax.tree.leaves(params)
    assert any(l.dtype == jnp.bfloat16 for l in flat_a)
    for a, b in zip(flat_a, flat_b):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
    np.testing.assert_array_equal(exp.embed(x), inf.embed(x))


def test_bundle_serves_in_fresh_process_without_model_code(bundle):
    _, out, dm = bundle
    # the subprocess imports ONLY serve + numpy — never the model class;
    # conftest-style CPU forcing because the axon sitecustomize ignores
    # JAX_PLATFORMS env
    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {str(REPO)!r})
import numpy as np
from hyperbolic_vae_tpu.serve import ExportedInferencer
exp = ExportedInferencer.load({str(out)!r})
x = np.zeros((7,) + tuple(exp._manifest["data_shape"]), np.float32)
mu = exp.embed(x)
assert mu.shape == (7, exp._manifest["latent_dim"]), mu.shape
assert np.all(np.isfinite(mu))
print("SERVED", mu.shape)
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SERVED" in proc.stdout


def test_io_dtype_bundle_roundtrip(bundle):
    """A half-wire Inferencer exports programs with half in/out avals;
    the manifest records io_dtype and the loaded bundle replays the live
    half-wire endpoints bit-for-bit (and old manifests without the key
    still load as f32 wire)."""
    inf, out, dm = bundle
    half = Inferencer(inf.model, inf.params, batch_size=16,
                      max_batches_per_dispatch=4, io_dtype="float16")
    out2 = Path(out).parent / "bundle_f16"
    half.export_programs(out2)
    exp = ExportedInferencer.load(out2)
    assert exp._manifest["io_dtype"] == "float16"
    assert exp.io_dtype == np.dtype(np.float16)
    for n in (1, 17, 50):
        x = np.asarray(dm.x_test[:n], np.float32)
        a, b = exp.reconstruct(x), half.reconstruct(x)
        assert a.dtype == np.float32  # host-restored API dtype
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(exp.embed(x), half.embed(x))
    # pre-round-4 bundles have no io_dtype key -> f32 wire
    exp_plain = ExportedInferencer.load(out)
    assert exp_plain.io_dtype is None


def test_generate_exports_and_matches_live(bundle):
    """generate programs export (uint32 key-array inputs) and the bundle
    replays the live endpoint bit-for-bit."""
    inf, out, dm = bundle
    out2 = Path(out).parent / "bundle_gen"
    inf.export_programs(
        out2, methods=("encode", "decode", "reconstruct", "generate")
    )
    exp = ExportedInferencer.load(out2)
    for n in (1, 16, 40, 100):
        np.testing.assert_array_equal(
            exp.generate(n, seed=3), inf.generate(n, seed=3)
        )
    # a bundle exported WITHOUT generate refuses clearly
    exp_plain = ExportedInferencer.load(out)
    with pytest.raises(KeyError, match="not exported"):
        exp_plain.generate(4)
