"""Minimal HTTP serving front-end for the OrientationPredictor.

The reference has no serving path at all (its inference is an ad-hoc loop
inside `train.py:228-246`); `infer.OrientationPredictor` provides the
compiled, bucketed predictor and this demo wraps it in a stdlib HTTP server
— no framework dependencies — to show the end-to-end production shape:

    # random-init demo weights (or pass --orbax/--torch-ckpt for real ones)
    python demos/serve_http.py --port 8321 &

    curl -s -X POST localhost:8321/predict \
        -H 'Content-Type: application/json' \
        -d '{"clouds": [[[0.1, 0.2, 0.3], ...N points...]]}'
    # -> {"forward_vectors": [[x, y, z], ...], "batch": 1, "latency_ms": ...}

POST /predict accepts ``{"clouds": (B, N, 3) nested lists}`` and returns
decoded unit forward vectors; GET /healthz reports readiness. Requests of
any batch/point count are padded to the predictor's compiled buckets, so
steady-state requests never recompile.
"""

from __future__ import annotations

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_predictor(args):
    from pointcloud_orientation_tpu.infer import OrientationPredictor

    kw = dict(num_points=args.num_points, max_batch=args.max_batch)
    if args.quantize:
        kw["quantize"] = args.quantize
    if args.orbax:
        return OrientationPredictor.from_orbax_checkpoint(
            args.orbax, args.model, **kw)
    if args.torch_ckpt:
        return OrientationPredictor.from_torch_checkpoint(
            args.torch_ckpt, args.model, **kw)
    # random-init weights: demo/latency mode
    import jax
    import jax.numpy as jnp

    from pointcloud_orientation_tpu.models import MODEL_REGISTRY

    model = MODEL_REGISTRY[args.model]()
    pts = jax.random.normal(
        jax.random.PRNGKey(0), (2, args.num_points, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "sampling": jax.random.PRNGKey(2)},
        pts, train=False)
    return OrientationPredictor(
        args.model, variables["params"], variables.get("batch_stats"), **kw)


def make_handler(predictor):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "model": predictor.model_name,
                                 "num_points": predictor.num_points})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                return self._send(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                clouds = np.asarray(req["clouds"], np.float32)
                if clouds.ndim != 3 or clouds.shape[-1] != 3:
                    raise ValueError(f"clouds must be (B, N, 3), "
                                     f"got {clouds.shape}")
                t0 = time.perf_counter()
                fwd = predictor.forward_vectors(clouds)
                ms = (time.perf_counter() - t0) * 1e3
                self._send(200, {"forward_vectors": fwd.tolist(),
                                 "batch": int(clouds.shape[0]),
                                 "latency_ms": round(ms, 3)})
            except Exception as e:  # report, don't kill the server
                self._send(400, {"error": str(e)})

        def log_message(self, *a):  # quiet
            pass

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="pointnet_pp_8dir")
    ap.add_argument("--orbax", default=None)
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--quantize", default=None, choices=(None, "int8"))
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8321)
    args = ap.parse_args(argv)

    predictor = build_predictor(args)
    # warm the common bucket so the first request doesn't pay the compile
    predictor(np.zeros((1, args.num_points, 3), np.float32))
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(predictor))
    print(f"serving {args.model} on http://{args.host}:{server.server_port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
