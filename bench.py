"""Headline benchmark: RetinaNet-ResNet50 inference throughput on TPU,
full decode + class-aware-NMS path (BASELINE.md target: >= 2000 img/s on
v5e-8; this measures per-chip and scales by the data-parallel chip count).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.eval.predictor import make_predict_fn
    from cl_object_detection_tpu.models import create_retinanet

    H, W = 640, 1024          # canonical landscape eval shape
    BATCH = 8
    model = create_retinanet(ModelConfig(depth=50), num_classes=20)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    predict = make_predict_fn(model, PredictConfig())

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32))

    # warmup / compile
    det = predict(variables, images)
    jax.block_until_ready(det.scores)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        det = predict(variables, images)
    jax.block_until_ready(det.scores)
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * iters / dt
    baseline = 2000.0 / 8.0   # BASELINE.json: 2000 img/s on 8 chips -> per chip
    print(
        json.dumps(
            {
                "metric": "retinanet_r50_640x1024_infer_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
