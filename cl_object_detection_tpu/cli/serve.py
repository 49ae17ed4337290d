"""Batched detection HTTP server.

Production-serving surface (beyond the reference, which is research
scripts only): a stdlib HTTP server that micro-batches concurrent
requests into the jitted predict path, amortizing device dispatch.

    python -m cl_object_detection_tpu.cli.serve --root_dir . --scenario 20 \
        --state 0 [--port 8500] [--cpu]
    python -m cl_object_detection_tpu.cli.serve --from_export artifact/
        # frozen cli.export artifact: no checkpoint tree, no model code

API:
  POST /detect      body: raw JPEG/PNG bytes
                    -> {"detections": [{"box": [x1,y1,x2,y2],
                        "score": s, "class_id": c}, ...]}
  GET  /healthz     -> ok
"""
from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir", default=".")
    parser.add_argument("--scenario", nargs="+", default=["20"])
    parser.add_argument("--state", type=int, default=0)
    parser.add_argument("--epoch", type=int, default=-1)
    parser.add_argument("--depth", type=int, default=None,
                        help="backbone depth; default: read from the "
                             "training run's params.json (else 50)")
    parser.add_argument("--port", type=int, default=8500)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--batch_window_ms", type=float, default=5.0)
    parser.add_argument("--score_thresh", type=float, default=0.3)
    parser.add_argument("--request_ttl", type=float, default=60.0,
                        help="seconds before a queued request expires "
                             "(handler 503s and the device thread skips it)")
    parser.add_argument("--quantize", action="store_true",
                        help="int8 dynamic-PTQ convs (ops/quant.py)")
    parser.add_argument("--transfer_dtype", default="uint8",
                        choices=["float32", "uint8"],
                        help="host->device frame dtype; uint8 ships 4x "
                             "less infeed and normalizes on device "
                             "(models/resnet._device_normalize, exact-"
                             "parity tested) — the serving default since "
                             "infeed is the serving hot path")
    parser.add_argument("--from_export", default=None,
                        help="serve a cli.export artifact directory "
                             "(frozen StableHLO program; ignores "
                             "--root_dir/--scenario/--state/--epoch/"
                             "--depth/--quantize and takes batch/frame/"
                             "dtype from the artifact's meta.json)")
    parser.add_argument("--cpu", action="store_true")
    a = parser.parse_args(argv)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from ..config import DataConfig, PredictConfig
    from ..data.transforms import normalize_image
    from ..eval.predictor import make_predict_fn

    if a.from_export:
        # frozen-artifact path: no checkpoint tree, no model classes —
        # everything (weights, architecture, post-process, frame contract)
        # rides in the exported program + meta.json (eval/deploy.py)
        from ..eval.deploy import load_artifact

        if a.quantize:
            print("note: --quantize is ignored with --from_export "
                  "(quantization bakes in at cli.export time)")
        run_predict, meta = load_artifact(a.from_export)
        depth = meta["depth"]
        dcfg = DataConfig(height=meta["height"], width=meta["width"])
        s2d, fused = bool(meta["s2d"]), bool(meta["fused"])
        uint8 = meta["transfer_dtype"] == "uint8"
        if a.transfer_dtype != meta["transfer_dtype"]:
            print(f"note: artifact input dtype is "
                  f"{meta['transfer_dtype']} (--transfer_dtype ignored)")
        if a.max_batch != meta["batch"]:
            print(f"--max_batch {a.max_batch} -> {meta['batch']} "
                  f"(the artifact's static batch)")
            a.max_batch = meta["batch"]
        if a.score_thresh < meta["score_thresh"]:
            print(f"warning: --score_thresh {a.score_thresh} below the "
                  f"artifact's baked {meta['score_thresh']} floor")
    else:
        from ..eval.deploy import load_serving_bundle

        bundle = load_serving_bundle(
            a.root_dir, a.scenario, a.state, a.epoch, a.depth)
        depth = bundle.mcfg.depth
        dcfg = DataConfig(height=bundle.height, width=bundle.width)
        s2d, fused = bundle.s2d, bundle.fused
        uint8 = a.transfer_dtype == "uint8"
        # the jitted path must keep every candidate the server might emit
        predict = make_predict_fn(
            bundle.model,
            PredictConfig(score_thresh=min(0.05, a.score_thresh),
                          quantize=a.quantize))
        variables = bundle.variables

        def run_predict(images):
            det = predict(variables, jnp.asarray(images))
            return {"boxes": np.asarray(det.boxes),
                    "scores": np.asarray(det.scores),
                    "labels": np.asarray(det.labels),
                    "valid": np.asarray(det.valid)}

    def letterbox(img):
        """Fit ANY orientation into the single landscape serving frame:
        scale = min(H/h, W/w), then zero-pad (unlike training's two
        orientation buckets, a server wants exactly one compiled shape).
        Runs in the HANDLER threads so decode+resize parallelize across
        requests instead of serializing in the device thread. With
        --transfer_dtype uint8 the frame stays raw 8-bit (resize is still
        float; only the transfer quantizes, max error 0.5/255/pixel) and
        the backbone normalizes on device — 4x less bytes through the
        host->device link, which dominates serving latency."""
        h, w = img.shape[:2]
        scale = min(dcfg.height / h, dcfg.width / w)
        nh, nw = int(h * scale), int(w * scale)
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        out = np.zeros((dcfg.height, dcfg.width, 3),
                       np.uint8 if uint8 else np.float32)
        if uint8:
            out[:nh, :nw] = np.clip(np.round(resized * 255.0), 0, 255)
        else:
            out[:nh, :nw] = resized
            out = normalize_image(out)
        if s2d or fused:
            from ..data.transforms import space_to_depth

            out = space_to_depth(out[None], factor=4 if fused else 2)[0]
        return out, scale

    # fixed-size batcher: requests queue up; the device thread pads to
    # max_batch so ONE compiled shape serves every request
    work: "queue.Queue" = queue.Queue()

    # warm up (and validate model-vs-checkpoint compatibility) BEFORE
    # accepting traffic: a depth/frame mismatch must kill the process at
    # startup, not the background device thread after the socket is open
    frame_shape = ((dcfg.height // 2, dcfg.width // 2, 12) if s2d
                   else (dcfg.height // 4, dcfg.width // 4, 64) if fused
                   else (dcfg.height, dcfg.width, 3))
    frame_dtype = np.uint8 if uint8 else np.float32
    dummy = np.zeros((a.max_batch,) + frame_shape, frame_dtype)
    run_predict(dummy)
    print(f"serving on :{a.port} (batch {a.max_batch}, depth {depth}, "
          f"frame {dcfg.height}x{dcfg.width})")

    def device_loop():
        while True:
            first = work.get()
            batch = [first]
            deadline = time.perf_counter() + a.batch_window_ms / 1e3
            while len(batch) < a.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    batch.append(work.get(timeout=timeout))
                except queue.Empty:
                    break
            # drop requests whose client already timed out (their handler
            # returned 503 after done.wait); without this, a burst backlog
            # keeps burning device batches on abandoned work
            now = time.time()
            live = []
            for item in batch:
                if now - item[3] > a.request_ttl:
                    item[2].setdefault("error", "expired in queue")
                    item[1].set()
                else:
                    live.append(item)
            batch = live
            if not batch:
                continue
            try:
                images = np.zeros(
                    (a.max_batch,) + frame_shape, frame_dtype)
                scales = np.ones(a.max_batch, np.float32)
                for i, (img, _done, _out, _t) in enumerate(batch):
                    images[i], scales[i] = img
                det = run_predict(images)
                boxes, scores = det["boxes"], det["scores"]
                labels, valid = det["labels"], det["valid"]
                for i, (_img, done, out, _t) in enumerate(batch):
                    keep = valid[i] & (scores[i] > a.score_thresh)
                    out["detections"] = [
                        {
                            "box": (boxes[i, d] / scales[i]).tolist(),
                            "score": float(scores[i, d]),
                            "class_id": int(labels[i, d]),
                        }
                        for d in np.where(keep)[0]
                    ]
                    done.set()
            except Exception as e:  # keep serving; fail the affected requests
                for _img, done, out, _t in batch:
                    if done.is_set():
                        continue  # already answered successfully this batch
                    out.setdefault("error", f"{type(e).__name__}: {e}")
                    done.set()

    threading.Thread(target=device_loop, daemon=True).start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/detect":
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            arr = np.frombuffer(data, np.uint8)
            bgr = cv2.imdecode(arr, cv2.IMREAD_COLOR)
            if bgr is None:
                self.send_response(400)
                self.end_headers()
                self.wfile.write(b'{"error": "undecodable image"}')
                return
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255
            done = threading.Event()
            out: dict = {}
            work.put((letterbox(rgb), done, out, time.time()))
            if not done.wait(timeout=a.request_ttl):
                self.send_response(503)
                self.end_headers()
                self.wfile.write(b'{"error": "inference timeout"}')
                return
            body = json.dumps(out).encode()
            self.send_response(500 if "error" in out else 200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    ThreadingHTTPServer(("0.0.0.0", a.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
