"""HTTP serving demo (demos/serve_http.py).

Spins the stdlib server up in-process on an ephemeral port and exercises the
wire contract: /healthz readiness, /predict happy path (padded batch, decoded
unit forward vectors), and malformed-request error reporting.
"""

import json
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "demos"))
import serve_http  # noqa: E402


@pytest.fixture(scope="module")
def server():
    ns = type("NS", (), dict(model="pointnet_pp_8dir", orbax=None,
                             torch_ckpt=None, num_points=160, max_batch=8,
                             quantize=None))()
    predictor = serve_http.build_predictor(ns)
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              serve_http.make_handler(predictor))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200
    assert body["status"] == "ok" and body["model"] == "pointnet_pp_8dir"


def test_predict_returns_unit_forward_vectors(server):
    clouds = np.random.RandomState(0).randn(3, 160, 3).astype(np.float32)
    status, body = _post(server + "/predict", {"clouds": clouds.tolist()})
    assert status == 200, body
    fwd = np.asarray(body["forward_vectors"], np.float32)
    assert fwd.shape == (3, 3)
    np.testing.assert_allclose(np.linalg.norm(fwd, axis=-1), 1.0, atol=1e-5)
    assert body["batch"] == 3 and body["latency_ms"] > 0


def test_predict_rejects_bad_shape(server):
    status, body = _post(server + "/predict", {"clouds": [[1.0, 2.0, 3.0]]})
    assert status == 400 and "B, N, 3" in body["error"]
