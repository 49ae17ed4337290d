"""Batch-size sweep for the headline inference bench (experiment tool).

    python tools/bench_sweep.py [--stem rgb|fused] [batch sizes...]

Measured (v5e, R50 bf16, 608x832, approx top-k): rgb 436 @ B8, 482 @ B16,
514 @ B32, 520 @ B64 (plateau); fused stem 533 @ B32, 512 @ B48,
532 @ B64 — B32 is the knee either way (bench.py's operating point).
Family sweep (fused stem @ B32): R18 595, R34 484, R50 533, R101 437,
R152 366 img/s/chip (R34 < R50: BasicBlocks burn FLOPs at high spatial
resolution; R152 needs the benchlib consts-as-arguments path — closure
params overflow this rig's remote-compile request limit).
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


V5E_BF16_PEAK = 197e12  # same peak bench_train.py's train MFU uses


def run(batch, stem="rgb", iters=20, H=608, W=832, depth=50, want_mfu=False):
    import jax, jax.numpy as jnp
    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.utils.benchlib import (
        make_predict_sum,
        time_chained,
    )

    pcfg = PredictConfig(topk_method="approx")
    model = create_retinanet(
        ModelConfig(depth=depth, compute_dtype="bfloat16"), num_classes=20)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    anchors = jnp.asarray(anchors_for_shape(H, W))
    predict_sum = make_predict_sum(model, variables, anchors, pcfg, H, W)

    rng = np.random.RandomState(0)
    images = rng.randn(batch, H, W, 3).astype(np.float32)
    if stem == "fused":
        from cl_object_detection_tpu.data.transforms import space_to_depth

        images = space_to_depth(images, factor=4)
    images = jnp.asarray(images)
    dt = time_chained(predict_sum, images, iters=iters, reps=3)
    img_per_s = batch * iters / dt
    mfu = None
    if want_mfu:
        # XLA's own cost analysis of the single-batch predict program
        # (fwd + decode + NMS), same source as bench_train.py's train MFU.
        try:
            ca = (jax.jit(predict_sum)
                  .lower(images, variables).compile().cost_analysis())
            if hasattr(ca, "get"):  # newer jax returns a dict, older a list
                flops = float(ca.get("flops", 0.0))
            else:
                flops = float(ca[0].get("flops", 0.0))
            if flops:
                mfu = (flops / batch) * img_per_s / V5E_BF16_PEAK
        except Exception:
            pass
    return img_per_s, mfu


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stem", default="rgb", choices=["rgb", "fused"])
    ap.add_argument("--depth", type=int, default=50,
                    help="backbone depth (18/34/50/101/152) — model-family "
                         "scaling rows for the README")
    ap.add_argument("--mfu", action="store_true",
                    help="also report inference MFU from XLA cost analysis")
    ap.add_argument("batch", type=int, nargs="*", default=[8, 16, 32])
    a = ap.parse_args()
    for b in a.batch:
        img_per_s, mfu = run(b, a.stem, depth=a.depth, want_mfu=a.mfu)
        row = {"batch": b, "stem": a.stem, "depth": a.depth,
               "img_per_s": round(img_per_s, 2)}
        if mfu is not None:
            row["mfu"] = round(mfu, 4)
        print(json.dumps(row), flush=True)
