"""Profile the inference split: backbone+heads forward vs detect post-process.

Experiment tool for finding where the per-image milliseconds go. Defaults
match the HEADLINE bench configuration (608x832, batch 32, approx top-k —
bench.py); override with --height/--width/--batch/--topk to profile other
operating points. Same chained-fori_loop timing discipline as bench.py
(axon tunnel returns early from block_until_ready).

Usage: python tools/bench_split.py [--batch N] [--height H] [--width W]
                                   [--topk exact|approx] [mode ...]
modes: fwd, det, full, bb (backbone only), feats (backbone+FPN)
(heads cost = fwd - feats; FPN cost = feats - bb)
"""
import json, sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run(mode, batch=32, iters=20, H=608, W=832, topk="approx"):
    import jax, jax.numpy as jnp
    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_batch
    from cl_object_detection_tpu.utils.benchlib import (
        make_predict_sum,
        time_chained,
    )

    pcfg = PredictConfig(topk_method=topk)
    model = create_retinanet(ModelConfig(depth=50), num_classes=20)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    anchors = jnp.asarray(anchors_for_shape(H, W))

    def fwd_sum(images):
        logits, regression = model.apply(variables, images, enable_act=False)
        return jnp.sum(logits[..., 0]) * 1e-6 + jnp.sum(regression) * 1e-9

    def feats_sum(images):
        feats = model.apply(variables, images, method="forward_features")
        return sum(jnp.sum(f[..., 0].astype(jnp.float32)) for f in feats) * 1e-6

    def make_bb_sum():
        from cl_object_detection_tpu.models.resnet import ResNetBackbone

        bb = ResNetBackbone(depth=50, dtype=jnp.bfloat16)
        bvars = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))

        def bb_sum(images):
            c3, c4, c5 = bb.apply(bvars, images)
            return (jnp.sum(c5[..., 0].astype(jnp.float32)) * 1e-6
                    + jnp.sum(c3[..., 0].astype(jnp.float32)) * 1e-9)

        return bb_sum

    rng = np.random.RandomState(0)
    if mode in ("fwd", "full", "feats", "bb"):
        step = {
            "fwd": fwd_sum,
            "full": make_predict_sum(model, variables, anchors, pcfg, H, W),
            "feats": feats_sum,
            "bb": make_bb_sum() if mode == "bb" else None,
        }[mode]
        x0 = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))
        dt = time_chained(step, x0, iters=iters, reps=3)
    elif mode == "det":
        A = anchors.shape[0]
        logits = jnp.asarray(rng.randn(batch, A, 20).astype(np.float32) - 4)
        regs = jnp.asarray(rng.randn(batch, A, 4).astype(np.float32) * 0.1)

        def det_sum(l):
            det = detect_batch(
                l, regs, anchors, height=H, width=W,
                score_thresh=pcfg.score_thresh, iou_thresh=pcfg.nms_iou,
                pre_nms_topk=pcfg.pre_nms_topk,
                max_detections=pcfg.max_detections,
                nms_impl=pcfg.nms_impl, scores_are_logits=True,
                topk_method=topk,
            )
            return jnp.sum(det.scores)

        dt = time_chained(det_sum, logits, iters=iters, reps=3)
    else:
        raise SystemExit(f"unknown mode {mode}")

    return {
        "mode": mode,
        "batch": batch,
        "frame": f"{H}x{W}",
        "topk": topk,
        "ms_per_batch": round(dt / iters * 1e3, 3),
        "img_per_s": round(batch * iters / dt, 2),
    }


argv = sys.argv[1:]
kw = {}
while argv and argv[0].startswith("--"):
    flag, val, argv = argv[0], argv[1], argv[2:]
    kw[{"--batch": "batch", "--height": "H", "--width": "W",
        "--topk": "topk"}[flag]] = int(val) if flag != "--topk" else val
for m in argv or ["fwd", "det", "full"]:
    print(json.dumps(run(m, **kw)), flush=True)
