"""Batched detection inference: the reference's ``model.predict``
(/root/reference/retinanet/model.py:494-605) rebuilt for throughput.

The reference runs batch-size-1 predictions and papers over it with a
thread pool on one GPU (evaluator.py:383-426). Here the whole post-process
(sigmoid -> decode -> clip -> top-k -> class-aware NMS) is one jitted
function over full batches and static canonical shapes, so eval is a
single device-bound stream — this is the ">= 2000 img/s" BASELINE path.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PredictConfig
from ..data.loader import Batch
from ..ops.anchors import anchors_for_shape
from ..ops.boxes import clip_boxes, decode_boxes
from ..ops.nms import Detections, batched_nms


def make_predict_fn(
    model,
    predict_cfg: PredictConfig,
    bic_correct=None,
):
    """Returns jitted fn(variables, images) -> Detections (padded).

    The reference's ``thresh`` parameter is overwritten internally with
    0.05 (model.py:530) — here it's honored from PredictConfig.
    """
    nms_impl = getattr(predict_cfg, "nms_impl", "iterative")
    if nms_impl in ("pallas", "pallas_fp") and not (
        predict_cfg.use_pallas_nms
        and predict_cfg.pre_nms_topk % 256 == 0
        and jax.default_backend() not in ("cpu",)
    ):
        nms_impl = "iterative"  # kernels unavailable off-TPU / non-256 topk
                                # (identical detections either way)

    apply_fn = model.apply
    if getattr(predict_cfg, "quantize", False):
        from ..ops.quant import quantized_apply

        apply_fn = quantized_apply(model)  # int8 convs, head outputs bf16

    @jax.jit
    def predict(variables, images, class_scale=None, class_offset=None):
        # class_scale/class_offset: optional per-class affine on the
        # logits (the BiC correction as RUNTIME arrays) — lets multi-
        # epoch eval share ONE compiled program across checkpoints with
        # different bias states (evaluator.predict_dataset_multi)
        from ..data.transforms import logical_image_hw

        h, w = logical_image_hw(images)
        anchors = jnp.asarray(anchors_for_shape(h, w))
        logits, regression = apply_fn(variables, images, enable_act=False)
        if bic_correct is not None:
            logits = bic_correct(logits)
        elif class_scale is not None:
            logits = (logits * class_scale[None, None, :]
                      + class_offset[None, None, :])
        from ..ops.nms import detect_batch

        # sigmoid is monotone: selection happens on logits, sigmoid only
        # touches the k survivors (see ops.nms.detect_single)
        return detect_batch(
            logits,
            regression,
            anchors,
            height=h,
            width=w,
            score_thresh=predict_cfg.score_thresh,
            iou_thresh=predict_cfg.nms_iou,
            pre_nms_topk=predict_cfg.pre_nms_topk,
            max_detections=predict_cfg.max_detections,
            nms_impl=nms_impl,
            scores_are_logits=True,
            topk_method=getattr(predict_cfg, "topk_method", "exact"),
            bbox_std=tuple(getattr(predict_cfg, "bbox_std",
                                   (0.1, 0.1, 0.2, 0.2))),
        )

    return predict


def detections_to_coco(
    det: Detections,
    batch: Batch,
    label_to_cat: Dict[int, int],
    score_thresh: float = 0.05,
    keep_slots: Optional[Sequence[bool]] = None,
) -> List[dict]:
    """Device detections -> COCO result dicts (evaluator.py:336-366):
    un-scale boxes to original pixels, xyxy -> xywh, drop pad slots.
    ``keep_slots``: per-slot filter — the static loader wrap-fills short
    groups by REPEATING images inside one batch, so callers must emit
    each image's rows from exactly one slot."""
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    labels = np.asarray(det.labels)
    valid = np.asarray(det.valid)
    out: List[dict] = []
    for b in range(boxes.shape[0]):
        if keep_slots is not None and not keep_slots[b]:
            continue
        img_id = int(batch.image_ids[b])
        if img_id < 0:
            continue
        scale = float(batch.scales[b])
        for d in np.where(valid[b] & (scores[b] > score_thresh))[0]:
            x1, y1, x2, y2 = boxes[b, d] / scale
            out.append(
                {
                    "image_id": img_id,
                    "category_id": int(label_to_cat[int(labels[b, d])]),
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "score": float(scores[b, d]),
                }
            )
    return out


def make_sharded_predict_fn(
    model,
    predict_cfg: PredictConfig,
    mesh,
    bic_correct=None,
):
    """Data-parallel :func:`make_predict_fn` over a device mesh.

    Variables replicate; the image batch shards over the mesh's ``data``
    axis (batch size must be a multiple of the data-axis size) and each
    chip runs the full forward + decode + NMS on its shard — detection
    post-processing is per-image, so DP eval is embarrassingly parallel
    and XLA inserts no cross-chip collectives. This is the v5e-8
    ">= 2000 img/s" BASELINE path (8 x the single-chip rate; the
    reference instead thread-pools batch-size-1 predictions on one GPU,
    evaluator.py:383-426).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    base = make_predict_fn(model, predict_cfg, bic_correct)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    # replicate each distinct variables tree once, not per batch (keyed by
    # id with a strong ref so multi-epoch eval cycling E trees per batch
    # doesn't thrash a single-slot cache)
    placed: dict = {}

    def predict(variables, images, *extra):
        ent = placed.get(id(variables))
        if ent is None or ent[0] is not variables:
            ent = (variables, jax.device_put(variables, repl))
            placed[id(variables)] = ent
        images = jax.device_put(images, data)
        extra = tuple(jax.device_put(e, repl) for e in extra)
        return base(ent[1], images, *extra)

    return predict
