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


def test_raw_f16_wire(served):
    """X-Dtype: float16 on a raw body: the server parses <f2, replies <f2
    (echoing the dtype in X-Dtype), and the result matches the f32 path
    to f16 quantization; a bogus X-Dtype is a 400."""
    dm, inf, server = served
    x = np.ascontiguousarray(dm.x_train[:10], "<f2")
    req = urllib.request.Request(
        _url(server, "/v1/reconstruct"),
        data=x.tobytes(),
        headers={
            "Content-Type": "application/octet-stream",
            "X-Shape": ",".join(str(d) for d in x.shape),
            "X-Dtype": "float16",
        },
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.headers["X-Dtype"] == "float16"
        shape = tuple(int(s) for s in r.headers["X-Shape"].split(","))
        got = np.frombuffer(r.read(), "<f2").reshape(shape).astype(np.float32)
    ref = inf.reconstruct(x.astype(np.float32))
    np.testing.assert_allclose(got, ref, atol=2e-2)
    bad = urllib.request.Request(
        _url(server, "/v1/embed"), data=b"",
        headers={"Content-Type": "application/octet-stream",
                 "X-Shape": "0,28,28,1", "X-Dtype": "int8"},
    )
    try:
        urllib.request.urlopen(bad, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


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


class _SlowFakeEngine:
    """Inferencer stand-in: identity 'embed' that blocks on an event the
    first call, recording per-call row counts — lets coalescing tests be
    deterministic (no device, no races)."""

    batch_size = 8
    max_batches_per_dispatch = 4
    _buckets = [1, 2, 4]
    n_programs = 0

    def __init__(self):
        import threading as _t

        self.calls = []  # row count per underlying dispatch
        self.first_entered = _t.Event()
        self.release_first = _t.Event()
        self._first = True

    def embed(self, x):
        first, self._first = self._first, False
        self.calls.append(x.shape[0])
        if first:
            self.first_entered.set()
            assert self.release_first.wait(timeout=30)
        return np.asarray(x) * 2.0

    def decode(self, z):
        self.calls.append(z.shape[0])
        return np.asarray(z) + 1.0

    def reconstruct(self, x):
        raise RuntimeError("boom")


def test_coalescer_merges_queued_requests():
    """Requests that queue while a dispatch is in flight run as ONE
    underlying call, and every caller gets its own rows back."""
    from hyperbolic_vae_tpu.serve_http import CoalescingDispatcher

    eng = _SlowFakeEngine()
    disp = CoalescingDispatcher(eng)
    try:
        results = {}

        def hit(i, n):
            x = np.full((n, 3), float(i), np.float32)
            results[i] = (x, disp.call("embed", x))

        t0 = threading.Thread(target=hit, args=(0, 2))
        t0.start()
        assert eng.first_entered.wait(timeout=10)
        # 6 requests pile up while call 0 is blocked on the device
        rest = [threading.Thread(target=hit, args=(i, n))
                for i, n in enumerate([1, 5, 2, 7, 3, 1], start=1)]
        for t in rest:
            t.start()
        import time as _time
        deadline = _time.monotonic() + 10
        while disp._q.qsize() < 6 and _time.monotonic() < deadline:
            _time.sleep(0.005)
        eng.release_first.set()
        for t in [t0] + rest:
            t.join(timeout=30)
        assert len(results) == 7
        for i, (x, got) in results.items():
            np.testing.assert_array_equal(got, x * 2.0)
        # call 0 alone, then ONE merged call for the 6 queued (19 rows)
        assert eng.calls == [2, 19]
        assert disp.n_dispatches == 2 and disp.n_requests == 7
    finally:
        disp.close()


def test_coalescer_groups_by_method_and_shape():
    from hyperbolic_vae_tpu.serve_http import CoalescingDispatcher

    eng = _SlowFakeEngine()
    eng._first = False  # no blocking needed
    eng.release_first.set()
    disp = CoalescingDispatcher(eng, max_wait_ms=0.0)
    try:
        x = np.ones((4, 3), np.float32)
        z = np.ones((2, 2), np.float32)
        np.testing.assert_array_equal(disp.call("embed", x), x * 2.0)
        np.testing.assert_array_equal(disp.call("decode", z), z + 1.0)
    finally:
        disp.close()


def test_coalescer_propagates_errors_per_group():
    from hyperbolic_vae_tpu.serve_http import CoalescingDispatcher

    eng = _SlowFakeEngine()
    eng._first = False
    eng.release_first.set()
    disp = CoalescingDispatcher(eng)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            disp.call("reconstruct", np.ones((1, 3), np.float32))
        # the dispatcher thread survives an erroring group
        x = np.ones((2, 3), np.float32)
        np.testing.assert_array_equal(disp.call("embed", x), x * 2.0)
    finally:
        disp.close()


def test_http_coalescing_end_to_end(served):
    """Through real sockets + the real engine: concurrent requests served
    correctly AND in fewer dispatch groups than requests. Uses its own
    server with a straggler window so grouping is deterministic even on
    fast (CPU) dispatches."""
    from hyperbolic_vae_tpu.serve_http import InferenceServer

    dm, inf, _ = served
    server = InferenceServer(inf, port=0, max_wait_ms=150).start()
    try:
        sizes = [4, 9, 2, 16, 5, 11, 3, 8] * 2
        expected = {n: inf.embed(dm.x_train[:n]) for n in set(sizes)}
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
        for _, (n, got) in results.items():
            np.testing.assert_allclose(got, expected[n], atol=1e-5)
        assert server.dispatcher.n_requests == len(sizes)
        assert server.dispatcher.n_dispatches < len(sizes)
    finally:
        server.shutdown()


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


def test_dispatcher_close_fails_fast_and_drains():
    """After close(): new call()s raise immediately, and requests that
    raced into the queue are failed rather than hung (review finding)."""
    from hyperbolic_vae_tpu.serve_http import CoalescingDispatcher

    eng = _SlowFakeEngine()
    eng._first = False
    eng.release_first.set()
    disp = CoalescingDispatcher(eng)
    disp.close()
    with pytest.raises(RuntimeError, match="closed"):
        disp.call("embed", np.ones((1, 3), np.float32))
    # a future snuck into the queue around close() must be resolved
    from concurrent.futures import Future

    fut = Future()
    disp._q.put(("embed", np.ones((1, 3), np.float32), fut))
    disp._fail_pending()
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=5)


def test_metrics_endpoint(served):
    """/v1/metrics: per-endpoint counters + latency quantiles, error
    counting, and the Prometheus text exposition."""
    dm, inf, server = served
    before = json.loads(
        urllib.request.urlopen(_url(server, "/v1/metrics"), timeout=10).read()
    )
    n0 = before["endpoints"]["embed"]["requests"]
    rows0 = before["endpoints"]["embed"]["rows"]

    for _ in range(3):
        _post_json(server, "embed", dm.x_train[:7])

    snap = json.loads(
        urllib.request.urlopen(_url(server, "/v1/metrics"), timeout=10).read()
    )
    e = snap["endpoints"]["embed"]
    assert e["requests"] == n0 + 3
    assert e["rows"] == rows0 + 21
    assert e["p50_ms"] > 0 and e["p99_ms"] >= e["p50_ms"]
    assert snap["uptime_s"] > 0 and snap["programs"] >= 1

    # a malformed body increments bad_request, not an endpoint counter
    bad0 = snap["errors"]["bad_request"]
    req = urllib.request.Request(
        _url(server, "/v1/embed"), data=b"{not json",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=10)
    assert exc.value.code == 400
    snap2 = json.loads(
        urllib.request.urlopen(_url(server, "/v1/metrics"), timeout=10).read()
    )
    assert snap2["errors"]["bad_request"] == bad0 + 1

    with urllib.request.urlopen(
        _url(server, "/v1/metrics?format=prometheus"), timeout=10
    ) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert 'hvt_requests_total{endpoint="embed"}' in text
    assert 'hvt_latency_ms{endpoint="embed",quantile="p99"}' in text
    assert f'hvt_errors_total{{kind="bad_request"}} {bad0 + 1}' in text


def test_model_registry(served):
    """One process, multiple named models: per-model routes, /v1/models
    listing, coalescing across models, labeled metrics, back-compat
    default routes (review target: serve_http multi-model registry)."""
    dm, inf, _ = served
    # a second model with a DIFFERENT latent dim so outputs distinguish it
    model4 = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=4)
    trainer = Trainer(model4, max_epochs=1, early_stopping_patience=None,
                      check_finite=False)
    res4 = trainer.fit(dm)
    inf4 = Inferencer(model4, res4.best_params, batch_size=64,
                      max_batches_per_dispatch=4)
    server = InferenceServer({"flagship": inf, "wide": inf4}, port=0).start()
    try:
        with urllib.request.urlopen(_url(server, "/v1/models"), timeout=10) as r:
            listing = json.loads(r.read())
        assert listing["default"] == "flagship"
        assert set(listing["models"]) == {"flagship", "wide"}

        x = dm.x_train[:6]
        # default route -> first model (latent 2)
        out_default = _post_json(server, "embed", x)
        assert np.asarray(out_default[0]).shape == (6, 2)
        # named routes
        out_flag = _post_json_path(server, "/v1/models/flagship/embed", x)
        np.testing.assert_allclose(
            np.asarray(out_flag[0]), np.asarray(out_default[0]), atol=1e-6
        )
        out_wide = _post_json_path(server, "/v1/models/wide/embed", x)
        assert np.asarray(out_wide[0]).shape == (6, 4)
        np.testing.assert_allclose(
            np.asarray(out_wide[0]), inf4.embed(x), atol=1e-5
        )

        # unknown model -> 404 with the registry listed
        req = urllib.request.Request(
            _url(server, "/v1/models/nope/embed"),
            data=json.dumps({"data": np.asarray(x).tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 404

        # metrics: named-model traffic labeled "model/method"
        snap = json.loads(
            urllib.request.urlopen(_url(server, "/v1/metrics"), timeout=10).read()
        )
        assert snap["endpoints"]["wide/embed"]["requests"] == 1
        assert snap["endpoints"]["flagship/embed"]["requests"] == 1
        assert snap["endpoints"]["embed"]["requests"] == 1  # default route
    finally:
        server.shutdown()


def _post_json_path(server, path, x):
    req = urllib.request.Request(
        _url(server, path),
        data=json.dumps({"data": np.asarray(x).tolist()}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())["outputs"]


def test_registry_coalesces_across_models(served):
    """Concurrent requests to DIFFERENT models still group correctly:
    every caller gets its own model's output."""
    dm, inf, _ = served
    model4 = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=4)
    res4 = Trainer(model4, max_epochs=1, early_stopping_patience=None,
                   check_finite=False).fit(dm)
    inf4 = Inferencer(model4, res4.best_params, batch_size=64,
                      max_batches_per_dispatch=4)
    server = InferenceServer(
        {"flagship": inf, "wide": inf4}, port=0, max_wait_ms=30.0
    ).start()
    try:
        x = dm.x_train[:5]
        results = {}

        def hit(name, dim):
            out = _post_json_path(server, f"/v1/models/{name}/embed", x)
            results[name] = np.asarray(out[0])

        threads = [
            threading.Thread(target=hit, args=("flagship", 2)),
            threading.Thread(target=hit, args=("wide", 4)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert results["flagship"].shape == (5, 2)
        assert results["wide"].shape == (5, 4)
        np.testing.assert_allclose(results["wide"], inf4.embed(x), atol=1e-5)
    finally:
        server.shutdown()


def test_generate_endpoint(served):
    dm, inf, server = served
    req = urllib.request.Request(
        _url(server, "/v1/generate"),
        data=json.dumps({"n": 3, "seed": 5}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out = np.asarray(json.loads(r.read())["outputs"][0], np.float32)
    assert out.shape[0] == 3 and np.all(np.isfinite(out))
    np.testing.assert_allclose(out, inf.generate(3, seed=5), atol=1e-6)
    # out-of-bounds n -> 400
    bad = urllib.request.Request(
        _url(server, "/v1/generate"),
        data=json.dumps({"n": 0}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(bad, timeout=60)
    assert e.value.code == 400


def test_generate_raw_reply_and_manifest_truth(served):
    dm, inf, server = served
    # manifest advertises generate for a live VAE engine
    with urllib.request.urlopen(_url(server, "/v1/manifest"), timeout=60) as r:
        assert "generate" in json.loads(r.read())["methods"]
    req = urllib.request.Request(
        _url(server, "/v1/generate"),
        data=json.dumps({"n": 2, "seed": 1}).encode(),
        headers={"Content-Type": "application/json",
                 "Accept": "application/octet-stream"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        shape = tuple(int(s) for s in r.headers["X-Shape"].split(","))
        out = np.frombuffer(r.read(), "<f4").reshape(shape)
    np.testing.assert_allclose(out, inf.generate(2, seed=1), atol=1e-6)


def test_capability_gap_404_wire_400_and_shutdown_before_start(served, tmp_path):
    """Round-5 review findings: (1) a bundle exported without a method
    answers 404 (capability gap), not 500 inference_failed; (2) an
    invalid X-Dtype on /v1/generate is rejected 400 up front like
    do_POST's; (3) shutdown() on a server whose serve loop never
    started returns instead of deadlocking on socketserver's
    __is_shut_down event."""
    import time as _time

    from hyperbolic_vae_tpu.serve import ExportedInferencer

    dm, inf, server = served
    bundle = inf.export_programs(
        tmp_path / "bundle_recon_only", methods=("reconstruct",),
        platforms=("cpu",),
    )
    exp = ExportedInferencer.load(bundle)
    s2 = InferenceServer(exp, port=0).start()
    try:
        req = urllib.request.Request(
            _url(s2, "/v1/encode"),
            data=json.dumps({"data": dm.x_train[:4].tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 404
        assert "unavailable" in json.loads(e.value.read())["error"]
    finally:
        s2.shutdown()

    req = urllib.request.Request(
        _url(server, "/v1/generate"),
        data=json.dumps({"n": 4}).encode(),
        headers={"Content-Type": "application/json",
                 "Accept": "application/octet-stream",
                 "X-Dtype": "bfloat16"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400

    s3 = InferenceServer(inf, port=0)  # never started
    t0 = _time.monotonic()
    s3.shutdown()
    assert _time.monotonic() - t0 < 5.0


def test_incidental_bug_is_500_not_404(served, monkeypatch):
    """Round-5 session-3 review: capability gaps are answered by an
    UP-FRONT supports_method predicate, so an incidental AttributeError
    or KeyError raised INSIDE inference surfaces as 500 inference_failed
    (a genuine server fault), never reclassified as a 404 capability
    gap that monitoring would read as a client error."""
    dm, inf, server = served

    def boom(x):
        raise AttributeError("incidental bug inside inference")

    monkeypatch.setattr(inf, "embed", boom)
    req = urllib.request.Request(
        _url(server, "/v1/embed"),
        data=json.dumps({"data": dm.x_train[:2].tolist()}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 500
    assert "inference failed" in json.loads(e.value.read())["error"]

    def boom_gen(n, seed=0):
        raise KeyError("incidental KeyError inside generate")

    monkeypatch.setattr(inf, "generate", boom_gen)
    req = urllib.request.Request(
        _url(server, "/v1/generate"),
        data=json.dumps({"n": 2}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 500
