"""End-to-end test of the batched HTTP serving surface (cli/serve.py).

Builds a tiny run dir (R18, 64x64 frame, small heads) with a real Orbax
checkpoint + params.json, spawns ``cli.serve --cpu`` as a subprocess, and
drives it over HTTP: healthz, single detect, undecodable-body 400, and
concurrent posts through the micro-batcher. Runs with the default
``--transfer_dtype uint8`` infeed (on-device normalization) and score
threshold 0 so the untrained prior-bias model still emits detections.
"""
import http.client
import json
import os
import socket
import subprocess
import sys
import threading
import time
from types import SimpleNamespace

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import ModelConfig
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

    root = tmp_path_factory.mktemp("serve_run")
    mcfg = ModelConfig(depth=18, fpn_channels=32, head_layers=1,
                       pretrained=False)
    model = create_retinanet(mcfg, num_classes=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ckpt = CheckpointManager(str(root / "checkpoint"), ["3"])
    state = SimpleNamespace(params=variables["params"],
                            batch_stats=variables["batch_stats"],
                            opt_state={"none": np.zeros(1)}, step=0)
    ckpt.save(0, 1, state, il_meta={"num_classes": 3})
    with open(os.path.join(ckpt.state_dir(0), "params.json"), "w") as f:
        json.dump({
            "model": {"depth": 18, "fpn_channels": 32, "head_layers": 1,
                      "pretrained": False},
            "data": {"height": 64, "width": 64},
        }, f)
    return str(root)


@pytest.fixture(scope="module")
def server(run_dir):
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "cl_object_detection_tpu.cli.serve",
         "--cpu", "--root_dir", run_dir, "--scenario", "3", "--state", "0",
         "--port", str(port), "--max_batch", "2", "--batch_window_ms", "5",
         "--score_thresh", "0.0"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    deadline = time.time() + 300
    try:
        while True:
            assert proc.poll() is None, (
                f"server died: {proc.stdout.read().decode()[-2000:]}")
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request("GET", "/healthz")
                if c.getresponse().status == 200:
                    break
            except OSError:
                pass
            assert time.time() < deadline, "server never became healthy"
            time.sleep(1.0)
        yield port
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def _jpeg_bytes(seed: int = 0) -> bytes:
    import cv2

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (48, 80, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def _post(port: int, body: bytes, timeout: float = 120.0):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    c.request("POST", "/detect", body=body)
    r = c.getresponse()
    return r.status, r.read()


def test_detect_roundtrip(server):
    status, body = _post(server, _jpeg_bytes())
    assert status == 200
    out = json.loads(body)
    dets = out["detections"]
    # untrained prior-bias model: every class prob ~= 0.01 > thresh 0.0,
    # so NMS emits its padded capacity of (finite, in-frame) boxes
    assert len(dets) > 0
    for d in dets:
        x1, y1, x2, y2 = d["box"]
        assert 0 <= d["class_id"] < 3
        assert 0.0 < d["score"] < 1.0
        assert np.isfinite([x1, y1, x2, y2]).all()


def test_bad_body_is_400(server):
    status, _ = _post(server, b"this is not a jpeg")
    assert status == 400


def test_concurrent_requests_microbatch(server):
    results = []

    def one(seed):
        results.append(_post(server, _jpeg_bytes(seed)))

    threads = [threading.Thread(target=one, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    for status, body in results:
        assert status == 200
        assert "detections" in json.loads(body)
