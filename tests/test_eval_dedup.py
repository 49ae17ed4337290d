"""Wrap-slot dedup in batched eval (review r2): the static loader fills
short canonical-frame groups by REPEATING images inside one batch; every
repeat used to emit its (identical) COCO rows, corrupting AP."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from cl_object_detection_tpu.config import DataConfig, ModelConfig, PredictConfig
from cl_object_detection_tpu.data.coco import CocoJson
from cl_object_detection_tpu.eval.evaluator import Evaluator
from cl_object_detection_tpu.models import create_retinanet
from cl_object_detection_tpu.states import ILStates
from cl_object_detection_tpu.utils.toydata import make_toy_dataset


def test_predict_dataset_dedups_wrap_slots(tmp_path):
    root = str(tmp_path)
    make_toy_dataset(root, num_images=3, seed=2, split="train")
    coco = CocoJson(os.path.join(root, "train.json"))
    states = ILStates(list(coco.classes.values()), coco.classes_inverse, ["5"])
    data_cfg = DataConfig(batch_size=8, min_side=100, max_side=192,
                          height=128, width=192, max_boxes=8,
                          num_workers=0, prefetch=0)
    ev = Evaluator(coco, states, os.path.join(root, "images"), data_cfg,
                   PredictConfig(score_thresh=1e-4, max_detections=20),
                   state_index=0, eval_on_train=True)
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 5)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # batch 8 over 3 images -> each image occupies >= 2 slots of the batch
    batch = next(iter(ev.loader))
    ids = batch.image_ids.tolist()
    assert len(set(ids)) < len(ids), "fixture must wrap-fill within a batch"

    rows = ev.predict_dataset(model, variables)
    keys = [(r["image_id"], tuple(r["bbox"]), r["score"]) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate rows from wrap slots"

    multi = ev.predict_dataset_multi(model, {0: variables})
    keys = [(r["image_id"], tuple(r["bbox"]), r["score"]) for r in multi[0]]
    assert len(keys) == len(set(keys))
