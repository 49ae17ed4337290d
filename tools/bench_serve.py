"""Serving latency benchmark: drive `cli.serve` with concurrent JPEG
requests and report per-request latency percentiles + aggregate
throughput per concurrency level.

    python tools/bench_serve.py --root_dir /tmp/toyvoc/run --scenario 20 \
        --state 0 --image /tmp/toyvoc/data/images/img_0000.jpg \
        [--concurrency 1 8 16] [--requests 64] [--cpu]

Spawns the server as a child process (killed by handle on exit — never by
pattern), waits for /healthz, then measures. Each line of output is one
JSON record; the server's micro-batching (`--max_batch`, 5 ms window)
means latency at concurrency C amortizes one device dispatch over
min(C, max_batch) requests.

Reference: no serving surface exists upstream (research scripts only) —
this benchmarks the framework's production path (cli/serve.py).
"""
from __future__ import annotations

import argparse
import http.client
import json
import statistics
import subprocess
import sys
import threading
import time


def wait_healthy(port: int, proc: subprocess.Popen, timeout: float) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"server exited early (rc={proc.returncode})")
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
            c.request("GET", "/healthz")
            if c.getresponse().status == 200:
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError("server never became healthy")


def fire(port: int, payload: bytes, n: int, lat: list, errs: list) -> None:
    """One client thread: n sequential requests over a keep-alive conn."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    for _ in range(n):
        t0 = time.perf_counter()
        try:
            conn.request("POST", "/detect", body=payload,
                         headers={"Content-Type": "image/jpeg"})
            r = conn.getresponse()
            body = r.read()
            if r.status != 200:
                errs.append(f"HTTP {r.status}")
                continue
            json.loads(body)
            lat.append(time.perf_counter() - t0)
        except Exception as e:  # count, keep hammering
            errs.append(f"{type(e).__name__}")
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)


def pctl(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root_dir", default=None,
                    help="run dir (required unless --from_export)")
    ap.add_argument("--scenario", nargs="+", default=["20"])
    ap.add_argument("--state", type=int, default=0)
    ap.add_argument("--epoch", type=int, default=-1)
    ap.add_argument("--image", required=True, help="JPEG/PNG request body")
    ap.add_argument("--port", type=int, default=8531)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--concurrency", type=int, nargs="+", default=[1, 8, 16])
    ap.add_argument("--requests", type=int, default=64,
                    help="total requests per concurrency level")
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--startup_timeout", type=float, default=900.0,
                    help="first TPU compile through the tunnel is slow")
    ap.add_argument("--transfer_dtype", default=None,
                    choices=["float32", "uint8"],
                    help="forwarded to cli.serve (its default is uint8)")
    ap.add_argument("--dump_first", action="store_true",
                    help="print the first response's detections (parity "
                         "check between --transfer_dtype modes)")
    ap.add_argument("--from_export", default=None,
                    help="benchmark serving a cli.export artifact dir "
                         "instead of a live checkpoint")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args(argv)

    if not a.from_export and not a.root_dir:
        ap.error("--root_dir is required unless --from_export is given")
    payload = open(a.image, "rb").read()
    if a.from_export:
        cmd = [sys.executable, "-m", "cl_object_detection_tpu.cli.serve",
               "--from_export", a.from_export, "--port", str(a.port),
               "--max_batch", str(a.max_batch)]
    else:
        cmd = [sys.executable, "-m", "cl_object_detection_tpu.cli.serve",
               "--root_dir", a.root_dir, "--scenario", *a.scenario,
               "--state", str(a.state), "--epoch", str(a.epoch),
               "--port", str(a.port), "--max_batch", str(a.max_batch)]
    if a.transfer_dtype:
        cmd += ["--transfer_dtype", a.transfer_dtype]
    if a.cpu:
        cmd.append("--cpu")
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        wait_healthy(a.port, proc, a.startup_timeout)
        if a.dump_first:   # detection-parity check across transfer dtypes
            c = http.client.HTTPConnection("127.0.0.1", a.port, timeout=900)
            c.request("POST", "/detect", body=payload)
            print(json.dumps(json.loads(c.getresponse().read())), flush=True)
        warm_lat, warm_err = [], []
        fire(a.port, payload, a.warmup, warm_lat, warm_err)

        for conc in a.concurrency:
            per = max(1, a.requests // conc)
            lat: list = []
            errs: list = []
            threads = [threading.Thread(target=fire,
                                        args=(a.port, payload, per, lat, errs))
                       for _ in range(conc)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if not lat:
                print(json.dumps({"concurrency": conc, "error": errs[:3]}))
                continue
            print(json.dumps({
                "metric": "serve_detect_latency",
                "concurrency": conc,
                "requests": len(lat),
                "errors": len(errs),
                "p50_ms": round(pctl(lat, 50) * 1e3, 1),
                "p90_ms": round(pctl(lat, 90) * 1e3, 1),
                "p99_ms": round(pctl(lat, 99) * 1e3, 1),
                "mean_ms": round(statistics.mean(lat) * 1e3, 1),
                "req_per_s": round(len(lat) / wall, 1),
            }), flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
