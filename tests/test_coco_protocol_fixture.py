"""COCO-protocol parity on a dense synthetic fixture (VERDICT r1 #3).

A ~200-image, 6-class fixture with crowded/overlapping boxes, duplicate
detections, false positives and missed GT pins both evaluator paths
(the numpy implementation in eval/coco_eval.py and the C++ core in
native/coco_eval.cpp) against an INDEPENDENTLY TRANSCRIBED pycocotools
oracle below — a line-by-line re-derivation of COCOeval.evaluateImg +
accumulate semantics (pycocotools cocoeval.py), the protocol the reference
consumes via stats[1]/stats[8] (/root/reference/evaluator.py:189-253).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pytest

from cl_object_detection_tpu.eval.coco_eval import (
    IOU_THRESHOLDS,
    RECALL_THRESHOLDS,
    CocoProtocolEval,
)

N_IMAGES = 200
N_CLASSES = 6
CLASS_NAMES = [f"c{i}" for i in range(N_CLASSES)]


# ---------------------------------------------------------------------------
# fixture
# ---------------------------------------------------------------------------

class StubGT:
    """Just enough of data.coco.CocoJson for CocoProtocolEval."""

    def __init__(self, anns_by_img: Dict[int, List[dict]]):
        self._anns = anns_by_img
        self.classes = {cid: CLASS_NAMES[cid] for cid in range(N_CLASSES)}
        self.imgs = {i: {"id": i} for i in anns_by_img}

    def get_anns_by_img(self, img_id):
        return self._anns.get(img_id, [])

    def get_imgs_by_cats(self, cats):
        cats = {cats} if isinstance(cats, int) else set(cats)
        return [i for i, anns in self._anns.items()
                if any(a["category_id"] in cats for a in anns)]


def build_fixture(seed: int = 7) -> Tuple[StubGT, List[dict]]:
    """Crowded scenes: clustered, heavily overlapping GT; detections with a
    spread of IoUs, duplicates, class confusions and pure false positives."""
    rng = np.random.RandomState(seed)
    anns_by_img: Dict[int, List[dict]] = {}
    results: List[dict] = []
    for img in range(N_IMAGES):
        n_gt = rng.randint(3, 16)
        # cluster centers force overlap (inclusion-exclusion stress)
        centers = rng.rand(max(n_gt // 4, 1), 2) * 400 + 50
        gts = []
        for _ in range(n_gt):
            cx, cy = centers[rng.randint(len(centers))] + rng.randn(2) * 25
            w, h = rng.uniform(20, 120, 2)
            gts.append([cx - w / 2, cy - h / 2, w, h])
        cats = rng.randint(0, N_CLASSES, n_gt)
        anns_by_img[img] = [
            {"category_id": int(c), "bbox": [float(v) for v in b],
             "iscrowd": 0}
            for c, b in zip(cats, gts)
        ]
        for c, (x, y, w, h) in zip(cats, gts):
            for _ in range(1 + (rng.rand() < 0.3)):     # dup rate 30%
                if rng.rand() < 0.15:
                    continue                             # missed GT
                jitter = rng.uniform(0.0, 0.6)
                dx, dy = rng.randn(2) * jitter * np.array([w, h]) * 0.5
                sw, sh = 1 + rng.randn(2) * jitter * 0.3
                cat = int(c) if rng.rand() > 0.1 else int(
                    rng.randint(0, N_CLASSES))           # 10% class confusion
                results.append({
                    "image_id": img, "category_id": cat,
                    "bbox": [float(x + dx), float(y + dy),
                             float(max(w * sw, 4)), float(max(h * sh, 4))],
                    "score": float(rng.uniform(0.05, 1.0)),
                })
        for _ in range(rng.randint(0, 6)):               # false positives
            x, y = rng.rand(2) * 450
            w, h = rng.uniform(15, 100, 2)
            results.append({
                "image_id": img, "category_id": int(rng.randint(0, N_CLASSES)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "score": float(rng.uniform(0.05, 1.0)),
            })
    return StubGT(anns_by_img), results


# ---------------------------------------------------------------------------
# pycocotools-semantics oracle (independent transcription of
# COCOeval.evaluateImg + COCOeval.accumulate, no ignore/crowd regions)
# ---------------------------------------------------------------------------

def _iou(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """maskUtils.iou on xywh boxes, iscrowd all false."""
    out = np.zeros((len(dt), len(gt)))
    for d, (dx, dy, dw, dh) in enumerate(dt):
        for g, (gx, gy, gw, gh) in enumerate(gt):
            ix = max(0.0, min(dx + dw, gx + gw) - max(dx, gx))
            iy = max(0.0, min(dy + dh, gy + gh) - max(dy, gy))
            inter = ix * iy
            union = dw * dh + gw * gh - inter
            out[d, g] = inter / union if union > 0 else 0.0
    return out


def oracle_eval_class(
    gt: StubGT, results: Sequence[dict], cat_id: int,
    image_ids: Sequence[int], max_dets: int = 100,
) -> Tuple[float, float]:
    """Returns (stats[1]-style AP@0.5, stats[8]-style AR@[.5:.95])."""
    T = len(IOU_THRESHOLDS)
    per_img = []
    npig = 0
    for img in image_ids:
        g = np.asarray([a["bbox"] for a in gt.get_anns_by_img(img)
                        if a["category_id"] == cat_id], np.float64).reshape(-1, 4)
        npig += len(g)
        dt = [(r["score"], r["bbox"]) for r in results
              if r["image_id"] == img and r["category_id"] == cat_id]
        if not dt:
            continue
        # cocoeval: dtind = argsort(-score, kind='mergesort'); cap maxDets
        scores = np.asarray([s for s, _ in dt])
        dtind = np.argsort(-scores, kind="mergesort")[:max_dets]
        scores = scores[dtind]
        boxes = np.asarray([dt[j][1] for j in dtind], np.float64).reshape(-1, 4)
        D, G = len(scores), len(g)
        ious = _iou(boxes, g) if G else np.zeros((D, 0))
        dtm = np.zeros((T, D))
        gtm = np.zeros((T, G))
        for tind, t in enumerate(IOU_THRESHOLDS):
            for dind in range(D):
                iou = min(float(t), 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0:
                        continue
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dtm[tind, dind] = 1
                gtm[tind, m] = 1
        per_img.append((scores, dtm))

    if npig == 0:
        return -1.0, -1.0
    if not per_img:
        return 0.0, 0.0

    # --- accumulate
    dt_scores = np.concatenate([s for s, _ in per_img])
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([m for _, m in per_img], axis=1)[:, inds]
    tps = dtm > 0
    fps = dtm == 0
    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
    R = len(RECALL_THRESHOLDS)
    ap = np.zeros(T)
    recall_t = np.zeros(T)
    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        recall_t[t] = rc[-1] if nd else 0.0
        q = np.zeros((R,))
        pr = pr.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        rinds = np.searchsorted(rc, RECALL_THRESHOLDS, side="left")
        for ri, pi in enumerate(rinds):
            try:
                q[ri] = pr[pi]
            except IndexError:
                pass
        ap[t] = np.mean(q)
    return float(ap[0]), float(np.mean(recall_t))


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fixture():
    gt, results = build_fixture()
    return gt, results


def test_fixture_is_dense(fixture):
    gt, results = fixture
    n_gt = sum(len(gt.get_anns_by_img(i)) for i in range(N_IMAGES))
    assert n_gt > 1000 and len(results) > 1200


def test_python_path_matches_pycocotools_oracle(fixture):
    gt, results = fixture
    ev = CocoProtocolEval(gt, list(range(N_IMAGES)))
    for cid in range(N_CLASSES):
        ap, ar = ev.evaluate_class(results, cid, use_native=False)
        o_ap, o_ar = oracle_eval_class(gt, results, cid, list(range(N_IMAGES)))
        assert ap == pytest.approx(o_ap, abs=1e-9), f"class {cid} AP"
        assert ar == pytest.approx(o_ar, abs=1e-9), f"class {cid} AR"
        assert 0.0 < ap < 1.0          # a non-degenerate operating point


def test_native_path_matches_pycocotools_oracle(fixture):
    from cl_object_detection_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    gt, results = fixture
    ev = CocoProtocolEval(gt, list(range(N_IMAGES)))
    for cid in range(N_CLASSES):
        ap, ar = ev.evaluate_class(results, cid, use_native=True)
        o_ap, o_ar = oracle_eval_class(gt, results, cid, list(range(N_IMAGES)))
        # C++ core matches to float32 IoU/score precision
        assert ap == pytest.approx(o_ap, abs=1e-6), f"class {cid} AP"
        assert ar == pytest.approx(o_ar, abs=1e-6), f"class {cid} AR"


def test_empty_and_degenerate_classes(fixture):
    gt, results = fixture
    ev = CocoProtocolEval(gt, list(range(N_IMAGES)))
    # a category with no GT anywhere -> (-1, -1) like pycocotools' masked -1
    assert ev.evaluate_class(results, 999, use_native=False) == (-1.0, -1.0)
    # detections only (no GT for that class on a subset with none)
    empty_imgs = [i for i in range(N_IMAGES)
                  if not any(a["category_id"] == 0
                             for a in gt.get_anns_by_img(i))]
    if empty_imgs:
        ap, ar = ev.evaluate_class(results, 0, image_ids=empty_imgs[:5],
                                   use_native=False)
        o = oracle_eval_class(gt, results, 0, empty_imgs[:5])
        assert (ap, ar) == o
