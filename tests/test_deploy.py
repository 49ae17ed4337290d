"""AOT deployment artifacts (eval/deploy.py, cli/export.py,
cli/serve.py --from_export).

Pins the deployment contract: a checkpoint exported to serialized
StableHLO loads back WITHOUT the model classes and produces bit-identical
detections to the live predict path; the HTTP server serves the frozen
artifact end-to-end.
"""
import http.client
import json
import os
import socket
import subprocess
import sys
import time
from types import SimpleNamespace

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import ModelConfig
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

    root = tmp_path_factory.mktemp("deploy_run")
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
def artifact_dir(run_dir):
    from cl_object_detection_tpu.cli.export import main

    out = os.path.join(run_dir, "artifact")
    main(["--root_dir", run_dir, "--scenario", "3", "--state", "0",
          "--batch", "2", "--score_thresh", "0.0", "--out", out])
    return out


def test_artifact_files_and_meta(artifact_dir):
    from cl_object_detection_tpu.eval.deploy import (ARTIFACT_BLOB,
                                                     ARTIFACT_META)

    assert os.path.exists(os.path.join(artifact_dir, ARTIFACT_BLOB))
    with open(os.path.join(artifact_dir, ARTIFACT_META)) as f:
        meta = json.load(f)
    assert meta["batch"] == 2
    assert meta["frame_shape"] == [64, 64, 3]
    assert meta["transfer_dtype"] == "uint8"
    assert meta["num_classes"] == 3
    assert meta["depth"] == 18


def test_exported_matches_live_predict(run_dir, artifact_dir):
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import PredictConfig
    from cl_object_detection_tpu.eval.deploy import (load_artifact,
                                                     load_serving_bundle)
    from cl_object_detection_tpu.eval.predictor import make_predict_fn

    fn, meta = load_artifact(artifact_dir)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    out = fn(imgs)

    bundle = load_serving_bundle(run_dir, ["3"], 0)
    predict = make_predict_fn(bundle.model, PredictConfig(score_thresh=0.0))
    det = predict(bundle.variables, jnp.asarray(imgs))
    np.testing.assert_array_equal(out["labels"], np.asarray(det.labels))
    np.testing.assert_array_equal(out["valid"], np.asarray(det.valid))
    np.testing.assert_allclose(out["boxes"], np.asarray(det.boxes),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(out["scores"], np.asarray(det.scores),
                               rtol=1e-6, atol=1e-6)
    assert out["valid"].sum() > 0  # prior-bias model emits detections


def test_export_composes_with_quantize(run_dir):
    """int8 dynamic-PTQ (ops/quant.py's flax interceptor) bakes into the
    exported program — the artifact itself is quantized, no opt-in needed
    at serving time."""
    from cl_object_detection_tpu.eval.deploy import (export_predict,
                                                     load_artifact,
                                                     load_serving_bundle,
                                                     save_artifact)

    bundle = load_serving_bundle(run_dir, ["3"], 0)
    blob, meta = export_predict(bundle, batch=1, score_thresh=0.0,
                                quantize=True)
    assert meta["quantize"] is True
    out_dir = os.path.join(run_dir, "artifact_int8")
    save_artifact(out_dir, blob, meta)
    fn, _ = load_artifact(out_dir)
    imgs = np.random.RandomState(2).randint(0, 256, (1, 64, 64, 3), np.uint8)
    out = fn(imgs)
    assert out["valid"].sum() > 0
    assert np.isfinite(out["boxes"][out["valid"]]).all()


def test_bundle_arch_mismatch_fails_fast(run_dir):
    """A --depth override that contradicts the checkpoint must raise an
    informative structural error at load, not a flax scope error at first
    predict."""
    from cl_object_detection_tpu.eval.deploy import load_serving_bundle

    with pytest.raises(ValueError, match="does not match"):
        load_serving_bundle(run_dir, ["3"], 0, depth=50)


def test_export_bic_without_state_errors(run_dir):
    from cl_object_detection_tpu.eval.deploy import (export_predict,
                                                     load_serving_bundle)

    bundle = load_serving_bundle(run_dir, ["3"], 0)
    with pytest.raises(ValueError, match="BiC"):
        export_predict(bundle, batch=1, bic=True)


def test_export_bakes_bic_correction(tmp_path):
    """--bic on export: the artifact's detections must DIFFER from the
    uncorrected artifact's (the correction rides inside the frozen
    program — reference Bic_Evaluator applied in model.predict,
    model.py:504-505)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import ModelConfig, TrainConfig
    from cl_object_detection_tpu.eval.deploy import (export_predict,
                                                     load_artifact,
                                                     load_serving_bundle,
                                                     save_artifact)
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

    root = str(tmp_path)
    mcfg = ModelConfig(depth=18, fpn_channels=32, head_layers=1,
                       pretrained=False)
    model = create_retinanet(mcfg, num_classes=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ckpt = CheckpointManager(os.path.join(root, "checkpoint"), ["2", "1"])
    cfg = TrainConfig()
    cfg = dataclasses.replace(
        cfg, il=dataclasses.replace(cfg.il, scenario=("2", "1")))
    il_meta = {"num_classes": 3, "config": cfg.to_json(),
               # a strong correction so the prior-bias model's class-2
               # scores visibly move: 0.5*logit+2 lifts p from .01 to ~.43
               "bic": {"alphas": [0.5], "betas": [2.0]}}
    ckpt.save(1, 1, SimpleNamespace(params=variables["params"],
                                    batch_stats=variables["batch_stats"],
                                    opt_state={"none": np.zeros(1)}, step=0),
              il_meta=il_meta)
    with open(os.path.join(ckpt.state_dir(1), "params.json"), "w") as f:
        json.dump({"model": {"depth": 18, "fpn_channels": 32,
                             "head_layers": 1, "pretrained": False},
                   "data": {"height": 64, "width": 64}}, f)

    bundle = load_serving_bundle(root, ["2", "1"], 1)
    imgs = np.random.RandomState(3).randint(0, 256, (1, 64, 64, 3), np.uint8)
    outs = {}
    for use_bic in (False, True):
        blob, meta = export_predict(bundle, batch=1, score_thresh=0.0,
                                    bic=use_bic)
        assert meta["bic"] is use_bic
        d = os.path.join(root, f"art_bic_{use_bic}")
        save_artifact(d, blob, meta)
        fn, _ = load_artifact(d)
        outs[use_bic] = fn(imgs)
    # corrected artifact boosts new-class (id 2) scores; uncorrected
    # prior-bias model scores everything ~0.01
    bic_cls2 = outs[True]["scores"][outs[True]["labels"] == 2]
    assert bic_cls2.size and bic_cls2.max() > 0.2
    assert outs[False]["scores"].max() < 0.05
    assert not np.array_equal(outs[True]["scores"], outs[False]["scores"])


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_serve_from_export_http(artifact_dir):
    import cv2

    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "cl_object_detection_tpu.cli.serve",
         "--cpu", "--from_export", artifact_dir,
         "--port", str(port), "--batch_window_ms", "5",
         "--score_thresh", "0.0"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 300
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

        rng = np.random.RandomState(1)
        img = rng.randint(0, 256, (48, 80, 3), np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", "/detect", body=buf.tobytes())
        r = c.getresponse()
        assert r.status == 200
        dets = json.loads(r.read())["detections"]
        assert len(dets) > 0
        for d in dets:
            assert 0 <= d["class_id"] < 3
            assert np.isfinite(d["box"]).all()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
