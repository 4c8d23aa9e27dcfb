"""HTTP serving front-end (serve_http.py): wire formats, concurrency,
error paths, and the exported-bundle backend — all over real sockets."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.serve import Inferencer
from hyperbolic_vae_tpu.serve_http import InferenceServer
from hyperbolic_vae_tpu.train import Trainer


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    dm = make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(model, max_epochs=2, early_stopping_patience=None,
                      check_finite=False)
    result = trainer.fit(dm)
    inf = Inferencer(model, result.best_params, batch_size=64,
                     max_batches_per_dispatch=4)
    server = InferenceServer(inf, port=0).start()  # free port
    yield dm, inf, server
    server.shutdown()


def _url(server, path):
    return f"http://{server.host}:{server.port}{path}"


def _post_json(server, method, x):
    req = urllib.request.Request(
        _url(server, f"/v1/{method}"),
        data=json.dumps({"data": np.asarray(x).tolist()}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())["outputs"]


def _post_raw(server, method, x):
    x = np.ascontiguousarray(x, "<f4")
    req = urllib.request.Request(
        _url(server, f"/v1/{method}"),
        data=x.tobytes(),
        headers={
            "Content-Type": "application/octet-stream",
            "X-Shape": ",".join(str(d) for d in x.shape),
        },
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        shape = tuple(int(s) for s in r.headers["X-Shape"].split(","))
        return np.frombuffer(r.read(), "<f4").reshape(shape)


def test_health_and_manifest(served):
    _, inf, server = served
    with urllib.request.urlopen(_url(server, "/v1/health"), timeout=10) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    with urllib.request.urlopen(_url(server, "/v1/manifest"), timeout=10) as r:
        m = json.loads(r.read())
    assert m["batch_size"] == 64 and m["data_shape"] == [28, 28, 1]


def test_json_embed_matches_direct(served):
    dm, inf, server = served
    x = dm.x_train[:10]
    out = _post_json(server, "embed", x)
    np.testing.assert_allclose(np.asarray(out[0]), inf.embed(x), atol=1e-5)


def test_raw_roundtrip_matches_direct(served):
    dm, inf, server = served
    x = dm.x_train[:100]  # pads to 2 batches
    got = _post_raw(server, "reconstruct", x)
    np.testing.assert_allclose(got, inf.reconstruct(x), atol=1e-5)
    z = np.asarray(inf.embed(x[:5]))
    dec = _post_raw(server, "decode", z)
    np.testing.assert_allclose(dec, np.asarray(inf.decode(z)), atol=1e-5)


def test_encode_returns_all_outputs_in_json(served):
    dm, inf, server = served
    out = _post_json(server, "encode", dm.x_train[:4])
    direct = inf.encode(dm.x_train[:4])
    direct = direct if isinstance(direct, (tuple, list)) else [direct]
    assert len(out) == len(direct)
    for a, b in zip(out, direct):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_concurrent_ragged_requests_bounded_compiles(served):
    """16 threads x ragged sizes through the device lock: every response
    correct, and the program set stays within the bucket bound."""
    dm, inf, server = served
    sizes = [1, 3, 64, 65, 100, 128, 200, 256, 2, 7, 96, 130, 17, 33, 250, 5]
    expected = {n: inf.embed(dm.x_train[:n]) for n in set(sizes)}
    n_before = inf.n_programs
    results, errors = {}, []

    def hit(i, n):
        try:
            results[i] = (n, _post_raw(server, "embed", dm.x_train[:n]))
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append((i, n, repr(e)))

    threads = [threading.Thread(target=hit, args=(i, n))
               for i, n in enumerate(sizes)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert len(results) == len(sizes)
    for _, (n, got) in results.items():
        np.testing.assert_allclose(got, expected[n], atol=1e-5)
    assert inf.n_programs == n_before  # expected{} primed every bucket


def test_error_paths(served):
    _, _, server = served
    # unknown route -> 404
    req = urllib.request.Request(
        _url(server, "/v1/nonsense"), data=b"{}",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 404
    # malformed JSON -> 400
    req = urllib.request.Request(
        _url(server, "/v1/embed"), data=b"not json",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400
    # octet-stream with missing X-Shape -> 400
    req = urllib.request.Request(
        _url(server, "/v1/embed"), data=b"\x00" * 16,
        headers={"Content-Type": "application/octet-stream"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_bundle_backend_over_http(served, tmp_path):
    """Export -> ExportedInferencer -> HTTP: the model-code-free serving
    path answers over the network identically to the live one."""
    from hyperbolic_vae_tpu.serve import ExportedInferencer

    dm, inf, server = served
    bundle = inf.export_programs(tmp_path / "bundle", platforms=("cpu",))
    exp = ExportedInferencer.load(bundle)
    s2 = InferenceServer(exp, port=0).start()
    try:
        x = dm.x_train[:30]
        got = _post_raw(s2, "embed", x)
        np.testing.assert_allclose(got, inf.embed(x), atol=1e-6)
        with urllib.request.urlopen(_url(s2, "/v1/manifest"), timeout=10) as r:
            m = json.loads(r.read())
        assert m["data_shape"] == [28, 28, 1]
    finally:
        s2.shutdown()
