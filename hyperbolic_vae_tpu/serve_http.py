"""HTTP serving front-end: a network endpoint over the padded/bucketed
inference engine (serve.py).

The reference has no deployment story at all; this completes ours:
checkpoint (or model-code-free export bundle) -> a process answering
network requests. stdlib-only (http.server) — the serving image needs
jax + this package (or just jax + a bundle), no web framework.

Design constraints that shaped it:

  * One device, many client threads: every request funnels through ONE
    lock around the device dispatch. TPU programs are not reentrant per
    device, and the bucketed engine already turns any request size into
    a bounded number of dispatches — serializing them preserves the
    compile-cache and latency guarantees under concurrency.
  * Two wire formats per endpoint. JSON (nested lists) for
    convenience/debugging; raw little-endian f32 bytes with an
    ``X-Shape`` header for production (a 2048x784 reconstruct request is
    ~6.4 MB — JSON floats would triple that and dominate latency).
  * Startup pays ALL compiles (``--warmup``): first TPU compile through
    a remote relay can take minutes; a serving process must never pay
    that on a live request.

Endpoints:
  GET  /v1/health            {"status": "ok", "programs": N}
  GET  /v1/manifest          batch size, buckets, methods, shapes
  POST /v1/encode            posterior parameters (JSON: all outputs)
  POST /v1/embed             the on-manifold mean only (one array)
  POST /v1/decode            latents -> reconstruction
  POST /v1/reconstruct       inputs -> deterministic reconstruction

Request body: ``{"data": [[...], ...]}`` (application/json) or raw f32
bytes + ``X-Shape: n,d0,d1,...`` (application/octet-stream). Responses
mirror the request's content type; octet-stream responses carry the
FIRST output array (the embedding/reconstruction — use JSON to get
auxiliary outputs like posterior scales).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_METHODS = ("encode", "embed", "decode", "reconstruct")


def _to_arrays(out):
    if isinstance(out, (tuple, list)):
        return [np.asarray(a) for a in out]
    return [np.asarray(out)]


class InferenceServer:
    """Wrap an Inferencer (live or exported) in a threading HTTP server.

    ``serve_forever()`` blocks; ``start()`` runs it on a daemon thread
    (used by tests and by embedding into another process). ``port=0``
    picks a free port (read it back from ``server.port``).
    """

    def __init__(self, inferencer, host: str = "127.0.0.1", port: int = 8000):
        self.inferencer = inferencer
        self._device_lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet: one log line per request is the access log
            def log_message(self, fmt, *args):  # noqa: N802
                pass

            def _reply(self, code: int, payload: bytes, ctype: str,
                       extra: Optional[dict] = None):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(payload)

            def _reply_json(self, code: int, obj):
                self._reply(code, json.dumps(obj).encode(), "application/json")

            def do_GET(self):  # noqa: N802
                if self.path == "/v1/health":
                    self._reply_json(
                        200,
                        {"status": "ok", "programs": server.inferencer.n_programs},
                    )
                elif self.path == "/v1/manifest":
                    self._reply_json(200, server.manifest())
                else:
                    self._reply_json(404, {"error": f"no route {self.path}"})

            def do_POST(self):  # noqa: N802
                name = self.path.rsplit("/", 1)[-1]
                if not self.path.startswith("/v1/") or name not in _METHODS:
                    self._reply_json(404, {"error": f"no route {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(n)
                    ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                    if ctype == "application/octet-stream":
                        shape = tuple(
                            int(s) for s in self.headers["X-Shape"].split(",")
                        )
                        x = np.frombuffer(body, np.dtype("<f4")).reshape(shape)
                    else:
                        x = np.asarray(json.loads(body)["data"], np.float32)
                except Exception as e:  # malformed request, not a bug
                    self._reply_json(400, {"error": f"bad request: {e}"})
                    return
                try:
                    with server._device_lock:
                        out = _to_arrays(getattr(server.inferencer, name)(x))
                except Exception as e:
                    self._reply_json(500, {"error": f"inference failed: {e}"})
                    return
                if ctype == "application/octet-stream":
                    a = np.ascontiguousarray(out[0], np.dtype("<f4"))
                    self._reply(
                        200, a.tobytes(), "application/octet-stream",
                        {"X-Shape": ",".join(str(d) for d in a.shape)},
                    )
                else:
                    self._reply_json(200, {"outputs": [a.tolist() for a in out]})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def manifest(self) -> dict:
        inf = self.inferencer
        m = getattr(inf, "_manifest", None)
        return {
            "batch_size": inf.batch_size,
            "max_batches_per_dispatch": inf.max_batches_per_dispatch,
            "buckets": list(inf._buckets),
            "methods": list(_METHODS),
            "data_shape": list(m["data_shape"]) if m else list(
                getattr(inf.model, "data_shape", None)
                or getattr(inf.model, "input_size", None)
                or (getattr(inf.model, "in_features", 0),)
            ),
        }

    def start(self) -> "InferenceServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self):
        self._httpd.serve_forever()

    def shutdown(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def main(argv: Optional[list] = None):
    """CLI: serve a checkpoint or an exported bundle over HTTP."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="self-describing Orbax checkpoint dir")
    src.add_argument("--bundle", help="export_programs bundle dir (no model code)")
    p.add_argument("--name", default="best", help="checkpoint name (best/last)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--max-batches-per-dispatch", type=int, default=16)
    p.add_argument("--no-warmup", action="store_true",
                   help="skip priming every (method, bucket) program at startup")
    args = p.parse_args(argv)

    from hyperbolic_vae_tpu.serve import ExportedInferencer, Inferencer

    if args.bundle:
        inf = ExportedInferencer.load(args.bundle)
    else:
        inf = Inferencer.from_checkpoint(
            args.checkpoint, name=args.name, batch_size=args.batch_size,
            max_batches_per_dispatch=args.max_batches_per_dispatch,
        )
    if not args.no_warmup:
        print("warming up (compiling every method x bucket)...", flush=True)
        inf.warmup()
    server = InferenceServer(inf, host=args.host, port=args.port)
    print(f"serving on http://{server.host}:{server.port} "
          f"(batch {inf.batch_size}, buckets {inf._buckets})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
