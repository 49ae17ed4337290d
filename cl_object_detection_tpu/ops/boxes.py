"""Box math as pure JAX functions.

Covers the reference's ``calc_iou`` (/root/reference/retinanet/losses.py:4-21),
``BBoxTransform`` decode and regression-target encode
(/root/reference/retinanet/utils.py:82-126, losses.py:404-425) and
``ClipBoxes`` (utils.py:129-144).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

BBOX_STD = (0.1, 0.1, 0.2, 0.2)


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix (N, M) between xyxy boxes.

    Matches losses.py:4-21: intersection w/h clamped at 0, union clamped at
    a 1e-8 floor.
    """
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])

    iw = jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2]) - jnp.maximum(
        boxes_a[:, None, 0], boxes_b[None, :, 0]
    )
    ih = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3]) - jnp.maximum(
        boxes_a[:, None, 1], boxes_b[None, :, 1]
    )
    iw = jnp.clip(iw, 0)
    ih = jnp.clip(ih, 0)
    inter = iw * ih
    union = jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-8)
    return inter / union


def _center_form(boxes: jnp.ndarray):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode_boxes(
    anchors: jnp.ndarray,
    gt: jnp.ndarray,
    std: Sequence[float] = BBOX_STD,
) -> jnp.ndarray:
    """Regression targets (dx, dy, dw, dh)/std for anchor->gt (losses.py:404-425).

    GT width/height are clamped to >= 1 as in the reference.
    """
    acx, acy, aw, ah = _center_form(anchors)
    # centers come from the original corners; only width/height are clamped
    # (reference losses.py:407-410 — the clamp does not feed the centers)
    gcx, gcy, gw, gh = _center_form(gt)
    gw = jnp.clip(gw, 1.0)
    gh = jnp.clip(gh, 1.0)
    t = jnp.stack(
        [
            (gcx - acx) / aw,
            (gcy - acy) / ah,
            jnp.log(gw / aw),
            jnp.log(gh / ah),
        ],
        axis=-1,
    )
    return t / jnp.asarray(std, t.dtype)


def decode_boxes(
    anchors: jnp.ndarray,
    deltas: jnp.ndarray,
    std: Sequence[float] = BBOX_STD,
    mean: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """BBoxTransform decode (utils.py:102-126): deltas*std+mean -> xyxy."""
    acx, acy, aw, ah = _center_form(anchors)
    d = deltas * jnp.asarray(std, deltas.dtype) + jnp.asarray(mean, deltas.dtype)
    pcx = acx + d[..., 0] * aw
    pcy = acy + d[..., 1] * ah
    pw = jnp.exp(d[..., 2]) * aw
    ph = jnp.exp(d[..., 3]) * ah
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """ClipBoxes (utils.py:129-144): x1,y1 >= 0; x2 <= W; y2 <= H."""
    x1 = jnp.clip(boxes[..., 0], 0)
    y1 = jnp.clip(boxes[..., 1], 0)
    x2 = jnp.clip(boxes[..., 2], None, width)
    y2 = jnp.clip(boxes[..., 3], None, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def positive_assignment(anchors, boxes_i, labels_i, fg_iou: float = 0.5):
    """One image's positive-anchor assignment over -1-padded GT:
    ``(pos_mask (A,), assigned_label (A,))`` with invalid GT masked to
    IoU -1 and ties broken by argmax (lowest GT index). The shared
    matching core of the IL tool passes (MAS output norm, similarity
    accumulation, prototype features) — the focal loss keeps its own
    gather-free variant for the fused hot path (ops/focal_loss.py)."""
    import jax.numpy as jnp

    valid = labels_i >= 0
    iou = pairwise_iou(anchors, boxes_i)
    iou = jnp.where(valid[None, :], iou, -1.0)
    pos = jnp.max(iou, axis=1) >= fg_iou
    assigned = jnp.take(labels_i, jnp.argmax(iou, axis=1))
    return pos, assigned
