"""COCO-protocol evaluator vs hand-computed AP/AR fixtures."""
import numpy as np

from cl_object_detection_tpu.data.coco import CocoJson
from cl_object_detection_tpu.eval.coco_eval import CocoProtocolEval


def make_gt():
    data = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "height": 100, "width": 100},
            {"id": 2, "file_name": "b.jpg", "height": 100, "width": 100},
        ],
        "categories": [
            {"id": 10, "name": "cat"},
            {"id": 20, "name": "dog"},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 10, "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 10, "bbox": [60, 60, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 10, "bbox": [30, 30, 30, 30], "area": 900, "iscrowd": 0},
            {"id": 4, "image_id": 2, "category_id": 20, "bbox": [5, 5, 10, 10], "area": 100, "iscrowd": 0},
        ],
    }
    return CocoJson(data)


def test_perfect_detections():
    gt = make_gt()
    ev = CocoProtocolEval(gt, [1, 2])
    results = [
        {"image_id": 1, "category_id": 10, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 10, "bbox": [60, 60, 20, 20], "score": 0.8},
        {"image_id": 2, "category_id": 10, "bbox": [30, 30, 30, 30], "score": 0.95},
    ]
    ap, ar = ev.evaluate_class(results, 10)
    assert ap == 1.0
    assert ar == 1.0


def test_one_fp_above_tp():
    """1 GT (dog); det1 = FP at higher score, det2 = TP.
    PR curve: (r=0, p=0) -> (r=1, p=0.5); 101-pt AP = 0.5."""
    gt = make_gt()
    ev = CocoProtocolEval(gt, [1, 2])
    results = [
        {"image_id": 2, "category_id": 20, "bbox": [50, 50, 10, 10], "score": 0.9},
        {"image_id": 2, "category_id": 20, "bbox": [5, 5, 10, 10], "score": 0.8},
    ]
    ap, ar = ev.evaluate_class(results, 20)
    np.testing.assert_allclose(ap, 0.5, atol=1e-6)
    assert ar == 1.0


def test_miss_one_of_two():
    """2 GTs, only one detected perfectly: recall caps at 0.5.
    Envelope precision = 1 up to r=0.5 -> AP = 51/101."""
    gt = make_gt()
    ev = CocoProtocolEval(gt, [1])
    results = [
        {"image_id": 1, "category_id": 10, "bbox": [10, 10, 20, 20], "score": 0.9},
    ]
    ap, ar = ev.evaluate_class(results, 10, image_ids=[1])
    np.testing.assert_allclose(ap, 51 / 101, atol=1e-6)
    np.testing.assert_allclose(ar, 0.5, atol=1e-6)


def test_localization_quality_affects_ar_not_ap50():
    """Det with IoU ~0.6: counts at t=0.5/0.55/0.6 only -> AP@0.5 = 1 but
    AR (mean over 10 thresholds) < 1."""
    gt = make_gt()
    ev = CocoProtocolEval(gt, [2])
    # GT [30,30,30,30]; shifted det [30,30,30,30] with x off by 8 -> IoU = 22/38 ≈ 0.579
    results = [
        {"image_id": 2, "category_id": 10, "bbox": [38, 30, 30, 30], "score": 0.9},
    ]
    ap, ar = ev.evaluate_class(results, 10, image_ids=[2])
    assert ap == 1.0
    # IoU = (22*30)/(2*900 - 22*30) = 660/1140 ≈ 0.5789 -> passes t=0.50, 0.55 only
    np.testing.assert_allclose(ar, 2 / 10, atol=1e-6)


def test_no_gt_returns_minus_one():
    gt = make_gt()
    ev = CocoProtocolEval(gt, [1])
    ap, ar = ev.evaluate_class([], 20, image_ids=[1])
    assert ap == -1.0 and ar == -1.0


def test_duplicate_detection_is_fp():
    """Second det on the same GT is a FP; with equal scores and maxDets the
    PR curve still reaches recall 1 with precision 0.5 at the tail."""
    gt = make_gt()
    ev = CocoProtocolEval(gt, [2])
    results = [
        {"image_id": 2, "category_id": 20, "bbox": [5, 5, 10, 10], "score": 0.9},
        {"image_id": 2, "category_id": 20, "bbox": [5, 5, 10, 10], "score": 0.8},
    ]
    ap, ar = ev.evaluate_class(results, 20, image_ids=[2])
    assert ap == 1.0  # TP comes first; envelope keeps precision 1 to r=1
    assert ar == 1.0


def test_evaluate_sweep():
    gt = make_gt()
    ev = CocoProtocolEval(gt, [1, 2])
    results = [
        {"image_id": 1, "category_id": 10, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 2, "category_id": 20, "bbox": [5, 5, 10, 10], "score": 0.9},
    ]
    out = ev.evaluate(results, [10, 20])
    assert set(out.ap50) == {"cat", "dog"}
    assert out.ap50["dog"] == 1.0
    assert out.pred_num == 2
    assert out.real_num == 4
    assert 0 < out.mean_ap50 <= 1
