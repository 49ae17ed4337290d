"""Profile the inference split: backbone+heads forward vs detect post-process.

Experiment tool for finding where the per-image milliseconds go at the
headline bench shape (640x1024, batch 16). Same chained-fori_loop timing
discipline as bench.py (axon tunnel returns early from block_until_ready).

Usage: python tools/bench_split.py [--batch N] [mode ...]
modes: fwd, det, full, bb (backbone only), feats (backbone+FPN)
(heads cost = fwd - feats; FPN cost = feats - bb)
"""
import json, sys, time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run(mode, batch=16, iters=20):
    import jax, jax.numpy as jnp
    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_batch

    H, W = 640, 1024
    pcfg = PredictConfig()
    model = create_retinanet(ModelConfig(depth=50), num_classes=20)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    anchors = jnp.asarray(anchors_for_shape(H, W))

    def fwd_sum(images):
        logits, regression = model.apply(variables, images, enable_act=False)
        return jnp.sum(logits[..., 0]) * 1e-6 + jnp.sum(regression) * 1e-9

    def feats_sum(images):
        feats = model.apply(variables, images, method="forward_features")
        return sum(jnp.sum(f[..., 0].astype(jnp.float32)) for f in feats) * 1e-6

    if mode == "bb":
        from cl_object_detection_tpu.models.resnet import ResNetBackbone

        bb = ResNetBackbone(depth=50, dtype=jnp.bfloat16)
        bvars = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))

        def bb_sum(images):
            c3, c4, c5 = bb.apply(bvars, images)
            return (jnp.sum(c5[..., 0].astype(jnp.float32)) * 1e-6
                    + jnp.sum(c3[..., 0].astype(jnp.float32)) * 1e-9)

    def full_sum(images):
        logits, regression = model.apply(variables, images, enable_act=False)
        det = detect_batch(
            logits, regression, anchors, height=H, width=W,
            score_thresh=pcfg.score_thresh, iou_thresh=pcfg.nms_iou,
            pre_nms_topk=pcfg.pre_nms_topk,
            max_detections=pcfg.max_detections, nms_impl=pcfg.nms_impl,
            scores_are_logits=True,
        )
        return jnp.sum(det.scores)

    rng = np.random.RandomState(0)
    if mode in ("fwd", "full", "feats", "bb"):
        step = {"fwd": fwd_sum, "full": full_sum, "feats": feats_sum,
                "bb": locals().get("bb_sum")}[mode]
        x0 = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))

        @jax.jit
        def chained(images):
            def body(i, acc):
                return acc + step(images + acc * 1e-12)
            return jax.lax.fori_loop(0, iters, body, 0.0)

    elif mode == "det":
        A = anchors.shape[0]
        logits = jnp.asarray(rng.randn(batch, A, 20).astype(np.float32) - 4)
        regs = jnp.asarray(rng.randn(batch, A, 4).astype(np.float32) * 0.1)
        x0 = logits

        @jax.jit
        def chained(logits):
            def body(i, acc):
                det = detect_batch(
                    logits + acc * 1e-12, regs, anchors, height=H, width=W,
                    score_thresh=pcfg.score_thresh, iou_thresh=pcfg.nms_iou,
                    pre_nms_topk=pcfg.pre_nms_topk,
                    max_detections=pcfg.max_detections,
                    nms_impl=pcfg.nms_impl, scores_are_logits=True,
                )
                return acc + jnp.sum(det.scores)
            return jax.lax.fori_loop(0, iters, body, 0.0)
    else:
        raise SystemExit(f"unknown mode {mode}")

    float(chained(x0))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chained(x0))
    dt = (time.perf_counter() - t0) / reps
    return {
        "mode": mode,
        "batch": batch,
        "ms_per_batch": round(dt / iters * 1e3, 3),
        "img_per_s": round(batch * iters / dt, 2),
    }


argv = sys.argv[1:]
batch = 16
if argv and argv[0] == "--batch":
    batch = int(argv[1])
    argv = argv[2:]
for m in argv or ["fwd", "det", "full"]:
    print(json.dumps(run(m, batch=batch)), flush=True)
