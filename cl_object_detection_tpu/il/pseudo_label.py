"""Pseudo-labeling of old classes in new-state images.

Re-implements /root/reference/IL_method/persuado_label.py (sic): run the
frozen previous-state model over the new state's training images; keep
detections with score > 0.7 whose IoU with EVERY new-class GT box is
< 0.35; store them as per-image COCO-format dicts that the dataset merges
after the real GT (data/dataset.py). The loss then discounts old-class
false positives on those anchors by training progress (ops/focal_loss.py).

The reference loops images one-by-one; here the batched predict path
(eval/predictor.py) is reused and the GT-overlap filter runs on host.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..config import PredictConfig, PseudoLabelConfig
from ..data.loader import BatchLoader
from ..eval.predictor import make_predict_fn


def _iou_one_to_many(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    if len(boxes) == 0:
        return np.zeros((0,))
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (box[2] - box[0]) * (box[3] - box[1])
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.clip(area_a + area_b - inter, 1e-8, None)


def generate_pseudo_labels(
    model,
    variables,
    dataset,                      # ILDataset over the CURRENT state's new images
    data_cfg,
    cfg: PseudoLabelConfig,
    label_to_cat: Dict[int, int],
    mesh=None,
) -> Dict[int, List[dict]]:
    """Returns {image_id: [coco-ann dicts]} (persuado_label.py:24-97).

    With ``mesh`` (single-process), the teacher inference runs through the
    sharded DP predict path (eval/predictor.make_sharded_predict_fn)."""
    import jax

    predict_cfg = PredictConfig(
        score_thresh=0.05, nms_iou=0.5,
        max_detections=cfg.max_labels_per_image * 4,
    )
    if mesh is not None and jax.process_count() == 1:
        from ..eval.predictor import make_sharded_predict_fn

        predict = make_sharded_predict_fn(model, predict_cfg, mesh)
    else:
        predict = make_predict_fn(model, predict_cfg)
    loader = BatchLoader(dataset, data_cfg, shuffle=False, augment=False)

    out: Dict[int, List[dict]] = {}
    seen = set()
    for batch in loader:
        det = predict(variables, batch.images)
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        for b in range(boxes.shape[0]):
            img_id = int(batch.image_ids[b])
            if img_id in seen:
                continue
            seen.add(img_id)
            scale = float(batch.scales[b])
            # new-class GT boxes in RESIZED pixels — REAL rows only: any
            # pseudo rows ride as the annotation tail and must not
            # suppress fresh teacher detections of old-class objects
            n = int(batch.num_boxes[b]) - int(batch.num_pseudo[b])
            gt = batch.boxes[b, :n]
            anns: List[dict] = []
            keep = np.where(valid[b] & (scores[b] > cfg.score_thresh))[0]
            for d in keep:
                if len(anns) >= cfg.max_labels_per_image:
                    break
                box = boxes[b, d]
                ious = _iou_one_to_many(box, gt)
                if len(ious) and ious.max() >= cfg.iou_thresh:
                    continue
                x1, y1, x2, y2 = box / scale
                anns.append(
                    {
                        "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                        "category_id": int(label_to_cat[int(labels[b, d])]),
                        "score": float(scores[b, d]),
                    }
                )
            out[img_id] = anns
    return out
