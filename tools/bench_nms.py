#!/usr/bin/env python
"""p50 NMS latency benchmark (BASELINE.md metric 3).

Times the suppression stage alone — the reference's
``torchvision.ops.batched_nms`` equivalent — on k score-sorted candidates:
the fused batched Pallas kernel (ops/nms_pallas.py) vs the fixed-point
XLA form (ops/nms.nms_iterative) and the fori_loop version
(ops/nms.nms_padded). The retired per-image scan kernels' r4 numbers
live in measurements/r4/nms.json.

Honest timing through the axon tunnel: N kernel invocations are chained
with data dependencies inside one jitted fori_loop and synced with a
scalar fetch; per-call latency = chain time / N.

    python tools/bench_nms.py [--k 1024] [--iters 50]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench(kind: str, k: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.nms import nms_iterative, nms_padded
    from cl_object_detection_tpu.ops.nms_pallas import nms_pallas_batched

    rng = np.random.RandomState(0)
    # plausible candidate stream: clustered boxes, descending scores
    centers = rng.rand(k, 2) * [1024, 640]
    sizes = 32 + rng.rand(k, 2) * 200
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1)
    boxes = jnp.asarray(np.clip(boxes, 0, [1024, 640, 1024, 640]), jnp.float32)
    scores = jnp.asarray(np.sort(rng.rand(k))[::-1].copy(), jnp.float32)

    fn = {
        "pallas_fp": lambda b, s, t: nms_pallas_batched(b[None], s[None], t)[0],
        "iterative": nms_iterative,
        "xla_loop": nms_padded,
    }[kind]

    @jax.jit
    def chained(b, s):
        def body(i, acc):
            keep = fn(b + acc * 1e-9, s, 0.5)
            return acc + jnp.sum(keep.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(chained(boxes, scores))  # compile + warm
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(boxes, scores))
        lat.append((time.perf_counter() - t0) / iters)
    return float(np.median(lat))


def bench_batched(kind: str, k: int, batch: int, iters: int) -> float:
    """Per-BATCH latency of the suppression stage over B images at once
    (the eval-loop shape; the iterative form turns this into one
    (B,k)x(k,k) matmul per fixed-point step)."""
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.nms import nms_iterative, nms_padded
    from cl_object_detection_tpu.ops.nms_pallas import nms_pallas_batched

    rng = np.random.RandomState(0)
    centers = rng.rand(batch, k, 2) * [1024, 640]
    sizes = 32 + rng.rand(batch, k, 2) * 200
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=2)
    boxes = jnp.asarray(np.clip(boxes, 0, [1024, 640, 1024, 640]), jnp.float32)
    scores = jnp.asarray(
        np.sort(rng.rand(batch, k), axis=1)[:, ::-1].copy(), jnp.float32
    )

    if kind == "pallas_fp":
        fn = lambda b, s: nms_pallas_batched(b, s, 0.5)
    else:
        inner = nms_iterative if kind == "iterative" else nms_padded
        fn = jax.vmap(lambda b, s: inner(b, s, 0.5))

    @jax.jit
    def chained(b, s):
        def body(i, acc):
            keep = fn(b + acc * 1e-9, s, )
            return acc + jnp.sum(keep.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(chained(boxes, scores))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(boxes, scores))
        lat.append((time.perf_counter() - t0) / iters)
    return float(np.median(lat))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=1024)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax

    on_tpu = jax.default_backend() != "cpu"
    kinds = (["pallas_fp", "iterative", "xla_loop"] if on_tpu
             else ["iterative", "xla_loop"])
    for kind in kinds:
        ms = bench(kind, args.k, args.iters) * 1e3
        print(
            json.dumps(
                {
                    "metric": f"nms_p50_latency_{kind}_k{args.k}",
                    "value": round(ms, 3),
                    "unit": "ms",
                }
            ),
            flush=True,
        )
    for kind in kinds:
        ms = bench_batched(kind, args.k, args.batch, args.iters) * 1e3
        print(
            json.dumps(
                {
                    "metric": f"nms_batched_latency_{kind}_k{args.k}_b{args.batch}",
                    "value": round(ms, 3),
                    "unit": "ms/batch",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
