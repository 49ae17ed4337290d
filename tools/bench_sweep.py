"""Batch-size sweep for the headline inference bench (experiment tool)."""
import json, sys
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

def run(batch, iters=20, H=608, W=832):
    import jax, jax.numpy as jnp
    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.utils.benchlib import (
        make_predict_sum,
        time_chained,
    )

    pcfg = PredictConfig(topk_method="approx")
    model = create_retinanet(ModelConfig(depth=50), num_classes=20)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    anchors = jnp.asarray(anchors_for_shape(H, W))
    predict_sum = make_predict_sum(model, variables, anchors, pcfg, H, W)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))
    dt = time_chained(predict_sum, images, iters=iters, reps=3)
    return batch * iters / dt

for b in [int(x) for x in sys.argv[1:]] or [8, 16, 32]:
    print(json.dumps({"batch": b, "img_per_s": round(run(b), 2)}), flush=True)
