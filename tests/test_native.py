"""C++ core parity vs the Python oracles (COCO eval + greedy NMS)."""
import numpy as np
import pytest

from cl_object_detection_tpu.native import (
    coco_eval_class_native,
    get_lib,
    greedy_nms_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


def random_problem(seed, n_imgs=6, n_det=80, n_gt=15):
    r = np.random.RandomState(seed)
    det_img = r.randint(0, n_imgs, n_det).astype(np.int32)
    det_score = r.rand(n_det).astype(np.float32)
    det_box = np.concatenate(
        [r.rand(n_det, 2) * 80, 5 + r.rand(n_det, 2) * 60], axis=1
    ).astype(np.float32)
    gt_img = r.randint(0, n_imgs, n_gt).astype(np.int32)
    gt_box = np.concatenate(
        [r.rand(n_gt, 2) * 80, 5 + r.rand(n_gt, 2) * 60], axis=1
    ).astype(np.float32)
    # make some detections perfect matches
    for i in range(min(8, n_det, n_gt)):
        det_img[i] = gt_img[i]
        det_box[i] = gt_box[i]
        det_score[i] = 0.9 + 0.01 * i
    return det_img, det_score, det_box, gt_img, gt_box, n_imgs


def python_eval(det_img, det_score, det_box, gt_img, gt_box, n_imgs):
    """Drive the Python oracle through CocoProtocolEval on a synthetic GT."""
    from cl_object_detection_tpu.data.coco import CocoJson
    from cl_object_detection_tpu.eval.coco_eval import CocoProtocolEval

    images = [{"id": i + 1, "file_name": f"{i}.jpg", "height": 200, "width": 200}
              for i in range(n_imgs)]
    anns = [
        {"id": k + 1, "image_id": int(gt_img[k]) + 1, "category_id": 1,
         "bbox": [float(v) for v in gt_box[k]], "area": 1.0, "iscrowd": 0}
        for k in range(len(gt_img))
    ]
    gt = CocoJson({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "x"}]})
    results = [
        {"image_id": int(det_img[k]) + 1, "category_id": 1,
         "bbox": [float(v) for v in det_box[k]], "score": float(det_score[k])}
        for k in range(len(det_img))
    ]
    ev = CocoProtocolEval(gt, [i + 1 for i in range(n_imgs)])
    return ev.evaluate_class(results, 1, use_native=False)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_coco_eval_parity(seed):
    prob = random_problem(seed)
    native = coco_eval_class_native(*prob)
    oracle = python_eval(*prob)
    np.testing.assert_allclose(native, oracle, atol=1e-9)


def test_no_gt():
    det_img = np.zeros(3, np.int32)
    out = coco_eval_class_native(
        det_img, np.ones(3, np.float32), np.ones((3, 4), np.float32),
        np.zeros(0, np.int32), np.zeros((0, 4), np.float32), 4,
    )
    assert out == (-1.0, -1.0)


def test_nms_parity(rng):
    from cl_object_detection_tpu.ops.nms import nms_padded
    import jax.numpy as jnp

    n = 128
    boxes = rng.rand(n, 4).astype(np.float32) * 100
    boxes[:, 2:] = boxes[:, :2] + 5 + rng.rand(n, 2).astype(np.float32) * 40
    scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()
    scores[100:] = 0
    ref = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    got = greedy_nms_native(boxes, scores, 0.5)
    np.testing.assert_array_equal(got, ref)


def test_threshold_boundary_parity():
    """Integer-coordinate boxes landing EXACTLY on an IoU threshold
    (17/20 == 0.85) and a recall grid point: the C++ grids must match
    numpy's arange(...).round(2) / linspace bit-for-bit (r2 fix — the
    naive 0.5 + 0.05*t / r/100.0 grids differ by 1 ulp)."""
    # GT box area 20 (xywh 0,0,10,2); det covers 17 of its 20 cells and
    # nothing else -> IoU exactly 17/20 = 0.85 in float
    det_img = np.array([0], np.int32)
    det_score = np.array([0.9], np.float32)
    det_box = np.array([[0.0, 0.0, 8.5, 2.0]], np.float32)  # area 17, inside
    gt_img = np.array([0], np.int32)
    gt_box = np.array([[0.0, 0.0, 10.0, 2.0]], np.float32)
    prob = (det_img, det_score, det_box, gt_img, gt_box, 1)
    assert 17.0 / 20.0 == np.arange(0.5, 1.0, 0.05).round(2)[7]
    native = coco_eval_class_native(*prob)
    oracle = python_eval(*prob)
    np.testing.assert_allclose(native, oracle, atol=0)
