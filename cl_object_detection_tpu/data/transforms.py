"""Host-side image transforms producing STATIC canonical shapes.

The reference resizes each image so min side -> 608 / max side <= 1024, pads
H and W up to a multiple of 32, and then pads each *batch* to its ragged max
(/root/reference/retinanet/dataloader.py:327-398). Ragged shapes would force
an XLA recompile per batch, so here every image lands in one of two fixed
canonical frames — landscape ``(height, width)`` or portrait
``(width, height)`` — chosen by orientation, and batches are drawn from a
single orientation bucket (the reference's AspectRatioBasedSampler,
dataloader.py:459-485, already groups batches by aspect ratio, so this is
the same idea made static).

Note: the reference's Resizer pads a full extra 32px when a side is already
32-aligned (dataloader.py:390-391) — a quirk we deliberately do not copy
(SURVEY.md §7 hard-part 7).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in the target image
    cv2 = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def pick_canonical(
    nh: int, nw: int, height: int, width: int,
    buckets: Tuple[Tuple[int, int], ...] = (),
) -> Tuple[int, int]:
    """Smallest canonical frame that fits a (nh, nw) RESIZED image.

    ``buckets`` are extra landscape-form frames (h, w), h <= w, each a
    multiple of 32; portrait images use their transposes. The default
    (height, width) frame is always a candidate, so an image that fits no
    bucket falls back to it. Fewer padded pixels = proportionally less
    conv work per batch (VOC-typical 608x810 images waste 23% of a
    640x1024 frame), at the cost of one compiled step per extra frame.
    """
    land = nw >= nh
    best = (height, width) if land else (width, height)
    for bh, bw in buckets:
        if not land:
            bh, bw = bw, bh
        if nh <= bh and nw <= bw and bh * bw < best[0] * best[1]:
            best = (bh, bw)
    return best


def compute_scale(h: int, w: int, min_side: int, max_side: int) -> float:
    """Reference Resizer scale rule (dataloader.py:369-385)."""
    smallest = min(h, w)
    largest = max(h, w)
    scale = min_side / smallest
    if largest * scale > max_side:
        scale = max_side / largest
    return scale


def resize_and_pad(
    image: np.ndarray,
    boxes: np.ndarray,
    min_side: int,
    max_side: int,
    height: int,
    width: int,
    buckets: Tuple[Tuple[int, int], ...] = (),
    frame: Tuple[int, int] = None,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Resize (bilinear) + zero-pad into the canonical frame.

    Args:
      image: (H, W, 3) float32 in [0, 1].
      boxes: (N, 4) xyxy in source pixels.
      frame: force this canonical (h, w) instead of re-deriving it from the
        decoded shape — the batch loader passes its metadata-derived group
        frame so a metadata/file disagreement (EXIF rotation) cannot land
        one example of a batch in a different frame and break np.stack.
    Returns:
      (padded image (Hc, Wc, 3), scaled boxes, scale).
    """
    h, w = image.shape[:2]
    scale = compute_scale(h, w, min_side, max_side)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    ch, cw = frame if frame is not None else pick_canonical(
        nh, nw, height, width, buckets)
    if nh > ch or nw > cw:
        # forced frame smaller than the scaled image (metadata/file
        # disagreement, e.g. EXIF rotation): shrink UNIFORMLY so boxes and
        # the returned scale stay consistent with the pixels — clamping
        # one axis would squash the image while boxes kept the old scale
        scale = min(scale, ch / h, cw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
    nh, nw = min(nh, ch), min(nw, cw)   # guard rounding

    if cv2 is not None:
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    else:  # tiny fallback for exotic test envs
        ys = (np.arange(nh) * (h / nh)).astype(np.int64).clip(0, h - 1)
        xs = (np.arange(nw) * (w / nw)).astype(np.int64).clip(0, w - 1)
        resized = image[ys][:, xs]

    out = np.zeros((ch, cw, 3), dtype=np.float32)
    out[:nh, :nw] = resized
    if boxes.size:
        boxes = boxes * scale
    return out, boxes.astype(np.float32), float(scale)


def normalize_image(image: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    """ImageNet normalization (reference Normalizer, dataloader.py:424-434)."""
    return (image - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def hflip(image: np.ndarray, boxes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal flip with xyxy box remap (reference Augmenter,
    dataloader.py:400-421). Operates on the UNPADDED image."""
    w = image.shape[1]
    image = image[:, ::-1].copy()
    if boxes.size:
        boxes = boxes.copy()
        x1 = boxes[:, 0].copy()
        x2 = boxes[:, 2].copy()
        boxes[:, 0] = w - x2
        boxes[:, 2] = w - x1
    return image, boxes


def pad_annotations(
    boxes: np.ndarray, labels: np.ndarray, max_boxes: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pad (N,4)/(N,) GT to static (max_boxes, 4)/(max_boxes,) with -1
    sentinel rows (the reference collater pads annotations with -1,
    dataloader.py:352)."""
    n = min(len(boxes), max_boxes)
    out_boxes = np.full((max_boxes, 4), -1.0, dtype=np.float32)
    out_labels = np.full((max_boxes,), -1, dtype=np.int32)
    if n:
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = labels[:n]
    return out_boxes, out_labels, n


def space_to_depth(images: np.ndarray, factor: int = 2) -> np.ndarray:
    """Space-to-depth for the phase-packed stem convs.

    ``factor=2``: ``(B, H, W, C) -> (B, H/2, W/2, 4C)`` with channel order
    (row-phase, col-phase, c) — the layout models.resnet.StemConv expects
    for its 12-channel input. ``factor=4``: ``(B, H, W, 3) ->
    (B, H/4, W/4, 64)`` (48 phase channels + 16 zero pad to a full lane
    half-tile) for the fully-fused Pallas stem (ops/stem_pallas.py,
    DataConfig.fused_stem). Pure host-side reshape/transpose (the
    equivalent device transpose costs ~4.7 ms/batch on v5e — the lane
    interleave defeats the VPU; on host it's free inside the decode
    workers).
    """
    b, h, w, c = images.shape
    # H, W must be multiples of 4: both phase-packed stems pool on the
    # H/4 grid, and an even-but-not-%4 dim silently yields feature maps
    # one row/col short of the RGB path (anchor/logit misalignment)
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    f = factor
    out = images.reshape(b, h // f, f, w // f, f, c)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    out = np.ascontiguousarray(out.reshape(b, h // f, w // f, f * f * c))
    if factor == 4:
        pad = np.zeros(out.shape[:3] + (64 - out.shape[-1],), out.dtype)
        out = np.concatenate([out, pad], axis=-1)
    return out


def logical_image_hw(images) -> Tuple[int, int]:
    """The logical (full-resolution) image height/width of a batch.

    Space-to-depth batches (12 channels, see :func:`space_to_depth`)
    carry each spatial dim halved; every consumer that picks anchors or
    orientation from the batch shape must go through this one helper.
    """
    h, w = int(images.shape[1]), int(images.shape[2])
    if images.shape[-1] == 12:
        return 2 * h, 2 * w
    if images.shape[-1] == 64:
        return 4 * h, 4 * w
    return h, w
