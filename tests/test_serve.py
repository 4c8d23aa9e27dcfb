"""Serving endpoint: fixed-batch padded inference over checkpoints."""

import numpy as np
import pytest

import jax

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.serve import Inferencer
from hyperbolic_vae_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    dm = make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    ckpt = tmp_path_factory.mktemp("serve") / "ckpt"
    trainer = Trainer(
        model, max_epochs=2, early_stopping_patience=None,
        checkpoint_dir=str(ckpt), check_finite=False,
    )
    result = trainer.fit(dm)
    return dm, model, result, str(ckpt)


def test_padded_matches_direct_apply(trained):
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64)
    # 100 samples: one full batch + a 36-sample padded batch
    x = dm.x_train[:100]
    mu = inf.embed(x)
    assert mu.shape == (100, 2)
    direct = model.apply({"params": result.best_params}, x[64:100], method="encode")
    direct_mu = direct[0] if isinstance(direct, tuple) else direct
    np.testing.assert_allclose(mu[64:100], np.asarray(direct_mu), atol=1e-6)
    # embeddings live on the ball
    assert np.all(np.linalg.norm(mu, axis=-1) < 1.0)


def test_reconstruct_shapes_and_range(trained):
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64)
    x = dm.x_train[:70]
    xh = inf.reconstruct(x)
    assert xh.shape == x.shape
    assert np.all((xh >= 0) & (xh <= 1))  # sigmoid output
    assert np.all(np.isfinite(xh))


def test_from_checkpoint_roundtrip(trained):
    dm, model, result, ckpt = trained
    inf = Inferencer.from_checkpoint(ckpt, batch_size=32).warmup()
    x = dm.x_train[:10]
    mu_ckpt = inf.embed(x)
    mu_live = Inferencer(model, result.best_params, batch_size=32).embed(x)
    np.testing.assert_allclose(mu_ckpt, mu_live, atol=1e-6)


def test_empty_request_no_new_compile(trained):
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64)
    inf.embed(dm.x_train[:10])  # primes the 1-batch program
    n_before = inf.n_programs
    mu = inf.embed(np.empty((0, 28, 28, 1), np.float32))
    assert mu.shape == (0, 2)
    assert inf.n_programs == n_before  # no out-of-bucket (0, ...) program


def test_mesh_batch_rounds_to_data_axis(trained):
    """batch_size not divisible by the mesh 'data' axis must round up,
    not crash the sharded device_put (round-3 review finding)."""
    from hyperbolic_vae_tpu.parallel import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    dm, model, result, _ = trained
    mesh = make_mesh(n_data=8)
    inf = Inferencer(model, result.best_params, batch_size=100, mesh=mesh)
    assert inf.batch_size == 104  # rounded to a multiple of 8
    mu = inf.embed(dm.x_train[:70])  # k=1 path
    assert mu.shape == (70, 2)
    xk = inf.embed(dm.x_train[:260])  # k>1 path shards axis 1
    assert xk.shape == (260, 2)
    ref = Inferencer(model, result.best_params, batch_size=104).embed(dm.x_train[:260])
    np.testing.assert_allclose(xk, ref, atol=1e-6)


def test_encode_split_with_odd_batch_on_mesh():
    from hyperbolic_vae_tpu.parallel import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    dm = make_data_module(batch_size=100, synthetic=True, n_train=200, n_test=60)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=1, early_stopping_patience=None,
        check_finite=False, mesh=make_mesh(n_data=8),
    )
    result = trainer.fit(dm)
    mu, labels = trainer.encode_split(dm, result.params, "val")
    assert mu.shape[0] == labels.shape[0]
    assert np.all(np.isfinite(mu))
    # the cached inferencer must not pin a params copy after the call
    assert trainer._encode_inferencer.params is None


def test_decode_endpoint(trained):
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=16)
    z = np.random.default_rng(0).normal(0, 0.3, (5, 2)).astype(np.float32)
    xh = inf.decode(z)
    assert xh.shape == (5,) + tuple(dm.input_shape)
    assert np.all(np.isfinite(xh))


def test_ragged_stream_bounded_compiles(trained):
    """An adversarial ragged request stream (every size 1..9 batches plus
    an over-cap request) must stay within the power-of-two bucket set:
    distinct compiled programs <= len(buckets) + 1 per method, and every
    response must match the direct model apply (padding is trimmed)."""
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=16,
                     max_batches_per_dispatch=8)
    assert inf._buckets == [1, 2, 4, 8]
    rng = np.random.default_rng(1)
    sizes = [1, 15, 16, 17, 33, 47, 64, 65, 100, 128, 129, 144,
             16 * 8 + 1, 16 * 8 * 2 + 5]  # the last two exceed the cap
    for n in sizes:
        x = dm.x_train[:n] if n <= len(dm.x_train) else np.concatenate(
            [dm.x_train, dm.x_train])[:n]
        mu = inf.embed(x)
        assert mu.shape == (n, 2)
        direct = model.apply({"params": result.best_params}, x, method="encode")
        direct_mu = direct[0] if isinstance(direct, tuple) else direct
        np.testing.assert_allclose(mu, np.asarray(direct_mu), atol=1e-6)
    # "encode" base program + one per bucket k>1 + one per sub-batch row
    # bucket used (k=1 reuses base)
    bound = len(inf._buckets) + 1 + len(inf._row_buckets)
    assert inf.n_programs <= bound, inf._compiled.keys()


def test_warmup_primes_all_buckets(trained):
    """After warmup() no request size triggers a new compile."""
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=16,
                     max_batches_per_dispatch=4)
    inf.warmup(methods=("encode",))
    primed = inf.n_programs
    for n in [1, 17, 40, 64, 65, 200]:
        x = np.concatenate([dm.x_train] * 2)[:n]
        inf.embed(x)
    assert inf.n_programs == primed


def test_serve_conv_family(tmp_path):
    """Inferencer is model-agnostic: the conv Euclidean VAE (tuple encode
    output, image decode) serves through the same endpoints."""
    import numpy as np

    from hyperbolic_vae_tpu.models import EuclideanVAE
    from hyperbolic_vae_tpu.data.core import ArrayDataModule

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (128, 32, 32, 3)).astype(np.float32)
    y = np.zeros(128, np.int32)
    dm = ArrayDataModule(x_train=x, y_train=y, x_val=x[:32], y_val=y[:32],
                         x_test=x[:32], y_test=y[:32], batch_size=32)
    model = EuclideanVAE(data_shape=(32, 32, 3), latent_dim=4)
    trainer = Trainer(model, max_epochs=1, early_stopping_patience=None,
                      check_finite=False)
    result = trainer.fit(dm)
    inf = Inferencer(model, result.params, batch_size=32)
    mu = inf.embed(x[:40])  # 40 -> k=2 scanned path
    assert mu.shape == (40, 4) and np.all(np.isfinite(mu))
    xh = inf.reconstruct(x[:10])
    assert xh.shape == (10, 32, 32, 3) and np.all(np.isfinite(xh))


def test_warmup_primes_decode_too(trained):
    """A production server must never compile on a live request — decode
    included (review finding: the default warmup skipped decode, so the
    first /v1/decode paid a relay compile)."""
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=16,
                     max_batches_per_dispatch=4)
    inf.warmup()  # default methods: reconstruct + encode + decode
    primed = inf.n_programs
    z = np.asarray(inf.embed(dm.x_train[:5]))
    for n in [1, 17, 64]:
        inf.decode(np.repeat(z, 13, axis=0)[:n])
    assert inf.n_programs == primed


def test_model_data_shape_helper():
    from hyperbolic_vae_tpu.serve import model_data_shape

    class _Img:
        data_shape = (28, 28, 1)

    class _Vec:
        input_size = 20480

    class _Bare:
        pass

    assert model_data_shape(_Img()) == (28, 28, 1)
    assert model_data_shape(_Vec()) == (20480,)
    with pytest.raises(AttributeError, match="data_shape"):
        model_data_shape(_Bare())


def test_sub_batch_row_buckets(trained):
    """A request smaller than one batch pads to the next power-of-two ROW
    count (not to the full batch): the dispatched program is registered
    under a (method, 'r', r) key, results match the direct apply, and
    disabling the feature reverts to full-batch padding."""
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64)
    assert inf._row_buckets == [1, 2, 4, 8, 16, 32]
    assert inf._row_bucket(1) == 1 and inf._row_bucket(5) == 8
    assert inf._row_bucket(33) is None  # 33..64 pads to the full batch
    for n in (1, 3, 8, 33):
        x = dm.x_train[:n]
        mu = inf.embed(x)
        assert mu.shape == (n, 2)
        direct = model.apply({"params": result.best_params}, x, method="encode")
        direct_mu = direct[0] if isinstance(direct, tuple) else direct
        np.testing.assert_allclose(mu, np.asarray(direct_mu), atol=1e-6)
    row_keys = [k for k in inf._compiled
                if isinstance(k, tuple) and len(k) == 3 and k[1] == "r"]
    assert sorted(k[2] for k in row_keys) == [1, 4, 8]  # 33 used the batch
    off = Inferencer(model, result.best_params, batch_size=64,
                     sub_batch_buckets=False)
    assert off._row_buckets == []
    np.testing.assert_allclose(off.embed(dm.x_train[:3]), inf.embed(dm.x_train[:3]),
                               atol=1e-6)
    assert not [k for k in off._compiled if isinstance(k, tuple) and len(k) == 3]


def test_empty_request_routes_to_smallest_ready_program(trained):
    """After only a sub-batch program exists, an empty request must reuse
    it (no fresh compile), and with nothing compiled it uses the smallest
    row bucket."""
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64)
    inf.embed(dm.x_train[:3])  # primes only (encode, 'r', 4)
    n = inf.n_programs
    mu = inf.embed(np.empty((0, 28, 28, 1), np.float32))
    assert mu.shape == (0, 2) and inf.n_programs == n
    fresh = Inferencer(model, result.best_params, batch_size=64)
    mu = fresh.embed(np.empty((0, 28, 28, 1), np.float32))
    assert mu.shape == (0, 2)
    assert ("encode", "r", 1) in fresh._compiled


def test_io_dtype_wire_rules(trained):
    """io_dtype applies to DATA-shaped wire arrays only: encode/reconstruct
    inputs and decode/reconstruct/generate outputs travel half; latent-
    shaped arrays (encode outputs, decode inputs) stay f32."""
    import jax.numpy as jnp

    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64, io_dtype="float16")
    assert inf._wire_in_dtype("encode") == jnp.dtype(jnp.float16)
    assert inf._wire_in_dtype("reconstruct") == jnp.dtype(jnp.float16)
    assert inf._wire_in_dtype("decode") == jnp.dtype(jnp.float32)
    # the compiled reconstruct program RETURNS half (D2H is halved too)
    xb = jnp.zeros((64, 28, 28, 1), jnp.float16)
    out = inf._fn("reconstruct")(result.best_params, xb)
    assert out.dtype == jnp.float16
    # encode output (the latent) stays f32
    out = inf._fn("encode")(result.best_params, xb)
    mu = out[0] if isinstance(out, tuple) else out
    assert mu.dtype == jnp.float32
    with pytest.raises(ValueError, match="float16 or bfloat16"):
        Inferencer(model, result.best_params, io_dtype="int8")


@pytest.mark.parametrize("io_dtype,atol", [("float16", 2e-2), ("bfloat16", 6e-2)])
def test_io_dtype_accuracy_and_api(trained, io_dtype, atol):
    """Half-wire endpoints return float32 numpy (API dtype unchanged)
    within quantization distance of the f32 pipeline, across the k=1,
    k>1, and padded paths."""
    dm, model, result, _ = trained
    f32 = Inferencer(model, result.best_params, batch_size=64)
    half = Inferencer(model, result.best_params, batch_size=64, io_dtype=io_dtype)
    x = dm.x_train[:100]  # one full batch + one padded batch
    for attr in ("embed", "reconstruct"):
        a, b = getattr(f32, attr)(x), getattr(half, attr)(x)
        assert b.dtype == np.float32 and b.shape == a.shape
        np.testing.assert_allclose(a, b, atol=atol)
        # sub-batch row-bucket path: half-dtype padding/concat too
        np.testing.assert_allclose(
            getattr(f32, attr)(x[:3]), getattr(half, attr)(x[:3]), atol=atol
        )
    assert np.all(np.linalg.norm(half.embed(x), axis=-1) < 1.0)


def test_io_dtype_decode_and_generate_exact_quantization(trained):
    """decode/generate inputs are NOT quantized (latent / PRNG key), so
    the half-wire result must equal the f32 result quantized at the exit
    cast — exactly, not approximately."""
    dm, model, result, _ = trained
    f32 = Inferencer(model, result.best_params, batch_size=64)
    half = Inferencer(model, result.best_params, batch_size=64, io_dtype="float16")
    z = np.asarray(f32.embed(dm.x_train[:5]))
    np.testing.assert_array_equal(
        half.decode(z), np.asarray(f32.decode(z), np.float16).astype(np.float32)
    )
    np.testing.assert_array_equal(
        half.generate(70, seed=3),
        np.asarray(f32.generate(70, seed=3), np.float16).astype(np.float32),
    )


def test_generate_seeded_and_batch_stable(trained):
    """generate(n, seed): replayable, append-only as n grows, bucketed,
    and matching a direct model.apply with the same per-batch keys."""
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64,
                     max_batches_per_dispatch=4)
    a = inf.generate(100, seed=7)
    assert a.shape[0] == 100 and np.all(np.isfinite(a))
    # replayable
    np.testing.assert_array_equal(a, inf.generate(100, seed=7))
    # append-only: growing n keeps the prefix
    b = inf.generate(200, seed=7)
    np.testing.assert_array_equal(b[:100], a)
    # different seed differs
    assert np.abs(inf.generate(100, seed=8) - a).max() > 1e-6
    # matches the model driven directly with batch-0's folded key
    direct = model.apply(
        {"params": result.best_params}, 64, method="generate",
        rngs={"sample": jax.random.fold_in(jax.random.PRNGKey(7), 0)},
    )
    np.testing.assert_allclose(a[:64], np.asarray(direct), atol=1e-6)


def test_generate_bounded_compiles(trained):
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64,
                     max_batches_per_dispatch=4)
    for n in [1, 63, 64, 65, 128, 200, 256, 300, 1000]:
        inf.generate(n)
    gen_programs = [k for k in inf._compiled
                    if k == "generate" or (isinstance(k, tuple) and k[0] == "generate")]
    assert len(gen_programs) <= len(inf._buckets) + 1, gen_programs


def test_warmup_primes_generate_too(trained):
    dm, model, result, _ = trained
    inf = Inferencer(model, result.best_params, batch_size=64,
                     max_batches_per_dispatch=4)
    inf.warmup()  # default methods must include generate for VAE families
    n0 = inf.n_programs
    inf.generate(1)
    inf.generate(64 * 4)   # full cap
    inf.generate(64 * 9)   # multi-piece
    assert inf.n_programs == n0
