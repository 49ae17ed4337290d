"""Padded NMS vs a naive O(n^2) numpy greedy reference."""
import numpy as np

from cl_object_detection_tpu.ops.nms import batched_nms, nms_padded, single_image_nms


def naive_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if scores[i] <= 0 or suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            ax1, ay1, ax2, ay2 = boxes[i]
            bx1, by1, bx2, by2 = boxes[j]
            iw = max(0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            union = max((ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter, 1e-8)
            if inter / union > thresh:
                suppressed[j] = True
    return sorted(keep)


def test_nms_matches_naive(rng):
    n = 64
    boxes = rng.rand(n, 4).astype(np.float32) * 100
    boxes[:, 2:] = boxes[:, :2] + 5 + rng.rand(n, 2).astype(np.float32) * 40
    scores = rng.rand(n).astype(np.float32)
    order = np.argsort(-scores)
    sboxes, sscores = boxes[order], scores[order]

    keep = np.asarray(nms_padded(sboxes, sscores, 0.5))
    got = sorted(order[np.where(keep)[0]].tolist())
    assert got == naive_nms(boxes, scores, 0.5)


def test_zero_scores_not_kept(rng):
    boxes = rng.rand(8, 4).astype(np.float32) * 50
    boxes[:, 2:] += boxes[:, :2] + 5
    scores = np.zeros(8, np.float32)
    keep = np.asarray(nms_padded(boxes, scores, 0.5))
    assert not keep.any()


def test_single_image_class_aware(rng):
    """Two perfectly-overlapping boxes of DIFFERENT classes both survive."""
    A, C = 32, 3
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (A, 1))
    prob = np.full((A, C), 1e-4, np.float32)
    prob[0, 0] = 0.9
    prob[1, 1] = 0.8
    det = single_image_nms(boxes, prob, max_detections=10)
    valid = np.asarray(det.valid)
    assert valid.sum() == 2
    got = set(np.asarray(det.labels)[valid].tolist())
    assert got == {0, 1}


def test_same_class_suppressed(rng):
    A, C = 16, 2
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (A, 1))
    prob = np.full((A, C), 1e-4, np.float32)
    prob[0, 0] = 0.9
    prob[1, 0] = 0.8  # same class, same box -> suppressed
    det = single_image_nms(boxes, prob, max_detections=10)
    assert np.asarray(det.valid).sum() == 1
    assert float(det.scores[0]) > 0.89


def test_batched(rng):
    B, A, C = 2, 40, 4
    boxes = rng.rand(B, A, 4).astype(np.float32) * 100
    boxes[..., 2:] = boxes[..., :2] + 10
    prob = rng.rand(B, A, C).astype(np.float32) * 0.5
    det = batched_nms(boxes, prob, max_detections=20)
    assert det.boxes.shape == (B, 20, 4)
    assert det.scores.shape == (B, 20)
    # scores sorted descending per image
    s = np.asarray(det.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_detect_single_matches_decode_first(rng):
    """select-then-decode == decode-then-select (identical results)."""
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.boxes import clip_boxes, decode_boxes
    from cl_object_detection_tpu.ops.nms import detect_single, single_image_nms

    anchors = jnp.asarray(anchors_for_shape(64, 64))
    A = anchors.shape[0]
    C = 4
    prob = (rng.rand(A, C) ** 3).astype(np.float32)
    reg = (rng.randn(A, 4) * 0.3).astype(np.float32)

    old = single_image_nms(
        clip_boxes(decode_boxes(anchors, jnp.asarray(reg)), 64, 64),
        jnp.asarray(prob), pre_nms_topk=256, max_detections=50,
    )
    new = detect_single(
        jnp.asarray(prob), jnp.asarray(reg), anchors, height=64, width=64,
        pre_nms_topk=256, max_detections=50,
    )
    np.testing.assert_allclose(np.asarray(old.scores), np.asarray(new.scores), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(old.labels), np.asarray(new.labels))
    np.testing.assert_array_equal(np.asarray(old.valid), np.asarray(new.valid))
    np.testing.assert_allclose(np.asarray(old.boxes), np.asarray(new.boxes), atol=1e-4)


def test_iterative_matches_scan(rng):
    """Fixed-point iterative NMS == sequential greedy, single and vmapped."""
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.nms import nms_iterative

    B, n = 4, 128
    boxes = rng.rand(B, n, 4).astype(np.float32) * 100
    boxes[..., 2:] = boxes[..., :2] + 5 + rng.rand(B, n, 2).astype(np.float32) * 60
    scores = rng.rand(B, n).astype(np.float32)
    scores[:, n // 2:] = 0.0  # padded tail must stay dead
    order = np.argsort(-scores, axis=1)
    sboxes = np.take_along_axis(boxes, order[..., None], axis=1)
    sscores = np.take_along_axis(scores, order, axis=1)

    for b in range(B):
        got = np.asarray(nms_iterative(jnp.asarray(sboxes[b]), jnp.asarray(sscores[b]), 0.5))
        want = np.asarray(nms_padded(jnp.asarray(sboxes[b]), jnp.asarray(sscores[b]), 0.5))
        np.testing.assert_array_equal(got, want)

    batched = np.asarray(
        jax.vmap(lambda bx, sc: nms_iterative(bx, sc, 0.5))(
            jnp.asarray(sboxes), jnp.asarray(sscores)
        )
    )
    for b in range(B):
        want = np.asarray(nms_padded(jnp.asarray(sboxes[b]), jnp.asarray(sscores[b]), 0.5))
        np.testing.assert_array_equal(batched[b], want)


def test_detect_batch_iterative_matches_scan(rng):
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_batch

    anchors = jnp.asarray(anchors_for_shape(64, 64))
    A, B, C = anchors.shape[0], 3, 4
    prob = (rng.rand(B, A, C) ** 3).astype(np.float32)
    reg = (rng.randn(B, A, 4) * 0.3).astype(np.float32)
    kw = dict(height=64, width=64, pre_nms_topk=256, max_detections=50)
    a = detect_batch(jnp.asarray(prob), jnp.asarray(reg), anchors, nms_impl="scan", **kw)
    b = detect_batch(jnp.asarray(prob), jnp.asarray(reg), anchors, nms_impl="iterative", **kw)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_detect_batch_pallas_fp_matches_iterative(rng):
    """The batched single-kernel path (interpret mode on CPU) must be
    bit-identical to the vmapped iterative production path end-to-end
    through candidate select + decode + class-aware NMS + top-k."""
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_batch

    anchors = jnp.asarray(anchors_for_shape(64, 64))
    A, B, C = anchors.shape[0], 3, 4
    prob = (rng.rand(B, A, C) ** 3).astype(np.float32)
    reg = (rng.randn(B, A, 4) * 0.3).astype(np.float32)
    kw = dict(height=64, width=64, pre_nms_topk=256, max_detections=50)
    a = detect_batch(jnp.asarray(prob), jnp.asarray(reg), anchors,
                     nms_impl="iterative", **kw)
    b = detect_batch(jnp.asarray(prob), jnp.asarray(reg), anchors,
                     nms_impl="pallas_fp", **kw)
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))

    # logits path too (the predictor's production route)
    logits = np.log(prob / (1 - prob)).astype(np.float32)
    al = detect_batch(jnp.asarray(logits), jnp.asarray(reg), anchors,
                      nms_impl="iterative", scores_are_logits=True, **kw)
    bl = detect_batch(jnp.asarray(logits), jnp.asarray(reg), anchors,
                      nms_impl="pallas_fp", scores_are_logits=True, **kw)
    np.testing.assert_allclose(np.asarray(al.scores), np.asarray(bl.scores),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(al.valid), np.asarray(bl.valid))

    # non-256-multiple k falls back cleanly (identical results, no error)
    kw_odd = dict(height=64, width=64, pre_nms_topk=100, max_detections=50)
    c = detect_batch(jnp.asarray(prob), jnp.asarray(reg), anchors,
                     nms_impl="pallas_fp", **kw_odd)
    d = detect_batch(jnp.asarray(prob), jnp.asarray(reg), anchors,
                     nms_impl="iterative", **kw_odd)
    np.testing.assert_allclose(np.asarray(c.scores), np.asarray(d.scores),
                               atol=1e-6)


def test_logits_path_matches_prob_path(rng):
    """scores_are_logits: selection on logits == selection on sigmoid(probs)."""
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_single

    anchors = jnp.asarray(anchors_for_shape(64, 64))
    A = anchors.shape[0]
    C = 4
    logits = (rng.randn(A, C) * 2 - 2).astype(np.float32)
    reg = (rng.randn(A, 4) * 0.3).astype(np.float32)

    a = detect_single(jnp.asarray(1 / (1 + np.exp(-logits))), jnp.asarray(reg),
                      anchors, height=64, width=64, pre_nms_topk=256,
                      max_detections=50)
    b = detect_single(jnp.asarray(logits), jnp.asarray(reg), anchors,
                      height=64, width=64, pre_nms_topk=256,
                      max_detections=50, scores_are_logits=True)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_approx_topk_matches_exact_on_survivors(rng):
    """topk_method="approx" (lax.approx_max_k pre-NMS select) keeps the
    same high-score NMS survivors as exact top-k: any divergence is
    confined to the far candidate tail (recall_target=0.95 over the
    anchor axis). Checks the top-10 final detections agree."""
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_single

    anchors = jnp.asarray(anchors_for_shape(64, 64))
    A = anchors.shape[0]
    logits = (rng.randn(A, 4) * 2 - 2).astype(np.float32)
    reg = (rng.randn(A, 4) * 0.3).astype(np.float32)
    kw = dict(height=64, width=64, pre_nms_topk=256, max_detections=50,
              scores_are_logits=True)

    a = detect_single(jnp.asarray(logits), jnp.asarray(reg), anchors,
                      topk_method="exact", **kw)
    b = detect_single(jnp.asarray(logits), jnp.asarray(reg), anchors,
                      topk_method="approx", **kw)
    n = 10
    np.testing.assert_allclose(np.asarray(a.scores[:n]),
                               np.asarray(b.scores[:n]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.labels[:n]),
                                  np.asarray(b.labels[:n]))
