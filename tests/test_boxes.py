"""IoU / encode / decode / clip vs naive numpy implementations."""
import numpy as np

from cl_object_detection_tpu.ops.boxes import (
    clip_boxes,
    decode_boxes,
    encode_boxes,
    pairwise_iou,
)


def naive_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, (ax1, ay1, ax2, ay2) in enumerate(a):
        for j, (bx1, by1, bx2, by2) in enumerate(b):
            iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0.0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            union = max(
                (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter, 1e-8
            )
            out[i, j] = inter / union
    return out


def test_pairwise_iou_matches_naive(rng):
    a = rng.rand(13, 4) * 100
    a[:, 2:] += a[:, :2]
    b = rng.rand(7, 4) * 100
    b[:, 2:] += b[:, :2]
    got = np.asarray(pairwise_iou(a.astype(np.float32), b.astype(np.float32)))
    np.testing.assert_allclose(got, naive_iou(a, b), rtol=1e-4, atol=1e-5)


def test_encode_decode_roundtrip(rng):
    anchors = rng.rand(50, 4).astype(np.float32) * 200
    anchors[:, 2:] = anchors[:, :2] + 10 + rng.rand(50, 2).astype(np.float32) * 90
    gt = rng.rand(50, 4).astype(np.float32) * 200
    gt[:, 2:] = gt[:, :2] + 5 + rng.rand(50, 2).astype(np.float32) * 80

    deltas = encode_boxes(anchors, gt)
    back = np.asarray(decode_boxes(anchors, deltas))
    np.testing.assert_allclose(back, gt, rtol=1e-3, atol=1e-2)


def test_encode_clamps_small_gt():
    anchors = np.array([[0, 0, 10, 10]], np.float32)
    gt = np.array([[5, 5, 5.2, 5.3]], np.float32)  # w,h < 1 -> clamped to 1
    d = np.asarray(encode_boxes(anchors, gt))
    assert np.isfinite(d).all()
    np.testing.assert_allclose(d[0, 2], np.log(1.0 / 10.0) / 0.2, rtol=1e-5)


def test_clip():
    boxes = np.array([[-5, -3, 700, 800]], np.float32)
    got = np.asarray(clip_boxes(boxes, height=600, width=640))
    np.testing.assert_allclose(got, [[0, 0, 640, 600]])
