#!/usr/bin/env python
"""Training-step throughput benchmark (single chip, real TPU).

Measures the full jitted joint-training step — RetinaNet-R50 forward at
640x1024, focal + smooth-L1 loss over all ~123k anchors, backward, grad
accumulation + Adam — in images/sec/chip.

Honest timing through the axon tunnel: each step's input is the previous
step's TrainState (a real data dependency), so N dispatched steps form one
on-device chain; fetching a scalar from the final state forces completion
of the whole chain (`block_until_ready` alone returns early here — see
bench.py and CLAUDE.md).

    python tools/bench_train.py [--batch 4 8] [--iters 20] [--remat]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run(batch: int, iters: int, remat: bool, depth: int = 50) -> float:
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ModelConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import StepStatics, make_train_step

    H, W, C, M = 640, 1024, 20, 32
    model = create_retinanet(ModelConfig(depth=depth, remat=remat), C)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    tx = make_optimizer(ScheduleConfig(lr=1e-5, every_iter=2), variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    anchors = jnp.asarray(anchors_for_shape(H, W))
    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C), StepStatics(every_iter=2), donate=True,
    )

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32) * 0.1)
    boxes = np.full((batch, M, 4), -1, np.float32)
    labels = np.full((batch, M), -1, np.int32)
    for b in range(batch):  # 8 valid GT boxes per image
        for j in range(8):
            x1 = 32 * (j + 1)
            y1 = 16 * (j + 1)
            boxes[b, j] = [x1, y1, x1 + 96, y1 + 64]
            labels[b, j] = (b + j) % C
    boxes = jnp.asarray(boxes)
    labels = jnp.asarray(labels)

    state, metrics = step(state, images, boxes, labels)     # compile + warm
    _ = float(metrics["total_loss"])

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, images, boxes, labels)
        _ = float(metrics["total_loss"])                     # sync the chain
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, nargs="+", default=[4, 8])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--depth", type=int, default=50)
    args = p.parse_args()
    for b in args.batch:
        ips = run(b, args.iters, args.remat, args.depth)
        print(
            json.dumps(
                {
                    "metric": f"retinanet_r{args.depth}_640x1024_train_images_per_sec_per_chip",
                    "batch": b,
                    "value": round(ips, 2),
                    "unit": "images/sec/chip",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
