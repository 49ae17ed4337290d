"""Batch-size sweep for the headline inference bench (experiment tool)."""
import json, time, sys
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

def run(batch, iters=20, H=608, W=832):
    import jax, jax.numpy as jnp
    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_batch

    pcfg = PredictConfig(topk_method="approx")
    model = create_retinanet(ModelConfig(depth=50), num_classes=20)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    anchors = jnp.asarray(anchors_for_shape(H, W))

    def predict_sum(images):
        logits, regression = model.apply(variables, images, enable_act=False)
        det = detect_batch(
            logits, regression, anchors, height=H, width=W,
            score_thresh=pcfg.score_thresh, iou_thresh=pcfg.nms_iou,
            pre_nms_topk=pcfg.pre_nms_topk,
            max_detections=pcfg.max_detections, nms_impl=pcfg.nms_impl,
            scores_are_logits=True, topk_method=pcfg.topk_method,
        )
        return jnp.sum(det.scores)

    @jax.jit
    def chained(images):
        def body(i, acc):
            return acc + predict_sum(images + acc * 1e-12)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))
    float(chained(images))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chained(images))
    dt = (time.perf_counter() - t0) / reps
    return batch * iters / dt

for b in [int(x) for x in sys.argv[1:]] or [8, 16, 32]:
    print(json.dumps({"batch": b, "img_per_s": round(run(b), 2)}), flush=True)
