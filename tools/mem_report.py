"""HBM footprint report: AOT-compile the train step and print XLA's
memory analysis per (depth, batch, remat) — the sizing table for "does
this config fit a 16 GB v5e chip" without running a step.

    python tools/mem_report.py [--depth 50 101] [--batch 8 16] [--remat]
           [--height 608 --width 832]

Uses jit(...).lower(...).compile().memory_analysis() (argument + output +
temp + generated-code bytes; args and outputs alias under donation, so
"peak" here is an upper bound). Compile through the remote tunnel takes
minutes per config; each row prints as soon as it's ready.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def report(depth: int, batch: int, remat: bool, H: int, W: int,
           cpu: bool = False) -> dict:
    import jax

    if cpu:  # smoke-test path: analyze on the host backend
        jax.config.update("jax_platforms", "cpu")
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

    C, M = 20, 32
    model = create_retinanet(ModelConfig(depth=depth, remat=remat), C)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    tx = make_optimizer(ScheduleConfig(lr=1e-5, every_iter=2),
                        variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"],
        tx=tx)
    anchors = jnp.asarray(anchors_for_shape(H, W))
    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C), StepStatics(every_iter=2), donate=True,
    )
    images = jnp.zeros((batch, H, W, 3), jnp.float32)
    boxes = jnp.asarray(np.full((batch, M, 4), -1, np.float32))
    labels = jnp.asarray(np.full((batch, M), -1, np.int32))
    mem = step.lower(state, images, boxes, labels).compile().memory_analysis()
    gib = 1024 ** 3

    def g(x):
        return round(x / gib, 3)

    return {
        "depth": depth, "batch": batch, "remat": remat,
        "frame": f"{H}x{W}",
        "args_gib": g(mem.argument_size_in_bytes),
        "temp_gib": g(mem.temp_size_in_bytes),
        "output_gib": g(mem.output_size_in_bytes),
        "code_gib": g(mem.generated_code_size_in_bytes),
        "peak_upper_gib": g(mem.argument_size_in_bytes
                            + mem.temp_size_in_bytes
                            + mem.output_size_in_bytes
                            + mem.generated_code_size_in_bytes),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--depth", type=int, nargs="+", default=[50])
    ap.add_argument("--batch", type=int, nargs="+", default=[8])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--cpu", action="store_true",
                    help="analyze on the CPU backend (smoke test)")
    a = ap.parse_args()
    for d in a.depth:
        for b in a.batch:
            print(json.dumps(report(d, b, a.remat, a.height, a.width,
                                    cpu=a.cpu)),
                  flush=True)
