"""Focal/smooth-L1 loss vs an independent numpy oracle of the reference
semantics (losses.py:253-452)."""
import numpy as np
import pytest

from cl_object_detection_tpu.ops.focal_loss import focal_loss


def numpy_oracle(p, reg, anchors, boxes, labels, alpha=0.25, gamma=2.0,
                 incremental=False, num_past=0, ignore_past=False):
    """Straight numpy transcription of the reference math for one image."""
    p = np.clip(p, 1e-4, 1 - 1e-4)
    valid = labels >= 0
    A, C = p.shape
    if not valid.any():
        fw = (1 - alpha) * p**gamma
        bce = -np.log(1 - p)
        return (fw * bce).sum(), 0.0, 0.0, 0

    vb = boxes[valid]
    vl = labels[valid]

    def iou(a, b):
        iw = np.clip(np.minimum(a[:, None, 2], b[None, :, 2]) - np.maximum(a[:, None, 0], b[None, :, 0]), 0, None)
        ih = np.clip(np.minimum(a[:, None, 3], b[None, :, 3]) - np.maximum(a[:, None, 1], b[None, :, 1]), 0, None)
        inter = iw * ih
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / np.clip(aa[:, None] + ab[None, :] - inter, 1e-8, None)

    I = iou(anchors, vb)
    imax, iarg = I.max(1), I.argmax(1)
    t = -np.ones((A, C))
    bg = imax < 0.4
    if incremental and ignore_past:
        t[np.ix_(bg, np.arange(num_past, C))] = 0
    else:
        t[bg] = 0
    pos = imax >= 0.5
    npos = pos.sum()
    t[pos] = 0
    t[pos, vl[iarg[pos]]] = 1

    fw = np.where(t == 1, 1 - p, p)
    fw = alpha * fw**gamma
    bce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    cl = np.where(t != -1, fw * bce, 0)
    norm = max(npos, 1)
    bg_loss = cl[t == 0].sum() / norm
    fg_loss = cl[t == 1].sum() / norm

    if npos:
        ab = vb[iarg[pos]]
        aw = anchors[pos, 2] - anchors[pos, 0]
        ah = anchors[pos, 3] - anchors[pos, 1]
        acx = anchors[pos, 0] + aw / 2
        acy = anchors[pos, 1] + ah / 2
        gw = np.clip(ab[:, 2] - ab[:, 0], 1, None)
        gh = np.clip(ab[:, 3] - ab[:, 1], 1, None)
        gcx = ab[:, 0] + (ab[:, 2] - ab[:, 0]) / 2
        gcy = ab[:, 1] + (ab[:, 3] - ab[:, 1]) / 2
        tg = np.stack([(gcx - acx) / aw, (gcy - acy) / ah, np.log(gw / aw), np.log(gh / ah)], 1)
        tg = tg / np.array([0.1, 0.1, 0.2, 0.2])
        d = np.abs(tg - reg[pos])
        sl = np.where(d <= 1 / 9, 0.5 * 9 * d**2, d - 0.5 / 9)
        reg_loss = sl.mean()
    else:
        reg_loss = 0.0
    return bg_loss, fg_loss, reg_loss, npos


def make_problem(rng, A=200, M=6, C=5):
    anchors = np.zeros((A, 4), np.float32)
    cx = rng.rand(A) * 256
    cy = rng.rand(A) * 256
    w = 16 + rng.rand(A) * 64
    h = 16 + rng.rand(A) * 64
    anchors[:, 0], anchors[:, 1] = cx - w / 2, cy - h / 2
    anchors[:, 2], anchors[:, 3] = cx + w / 2, cy + h / 2

    boxes = np.full((M, 4), -1.0, np.float32)
    labels = np.full((M,), -1, np.int32)
    n = 3
    # place GT on top of some anchors so positives exist
    for i in range(n):
        boxes[i] = anchors[i * 10] + rng.randn(4).astype(np.float32) * 2
        labels[i] = rng.randint(0, C)
    p = rng.rand(1, A, C).astype(np.float32) * 0.9 + 0.05
    reg = rng.randn(1, A, 4).astype(np.float32) * 0.5
    return p, reg, anchors, boxes[None], labels[None]


def test_matches_oracle(rng):
    p, reg, anchors, boxes, labels = make_problem(rng)
    out = focal_loss(p, reg, anchors, boxes, labels)
    bg, fg, rl, npos = numpy_oracle(p[0], reg[0], anchors, boxes[0], labels[0])
    np.testing.assert_allclose(float(out.bg_loss[0]), bg, rtol=1e-4)
    np.testing.assert_allclose(float(out.fg_loss[0]), fg, rtol=1e-4)
    np.testing.assert_allclose(float(out.reg_loss[0]), rl, rtol=1e-4)
    assert int(out.num_pos[0]) == npos
    # bg_mask is ~positive (for distillation)
    assert int((~np.asarray(out.bg_mask[0])).sum()) == npos


def test_empty_gt_image(rng):
    p, reg, anchors, boxes, labels = make_problem(rng)
    labels = np.full_like(labels, -1)
    out = focal_loss(p, reg, anchors, boxes, labels)
    bg, fg, rl, _ = numpy_oracle(p[0], reg[0], anchors, boxes[0], labels[0])
    np.testing.assert_allclose(float(out.bg_loss[0]), bg, rtol=1e-4)
    assert float(out.fg_loss[0]) == 0.0
    assert float(out.reg_loss[0]) == 0.0


def test_ignore_past_class(rng):
    p, reg, anchors, boxes, labels = make_problem(rng)
    out = focal_loss(
        p, reg, anchors, boxes, labels,
        incremental=True, num_past_class=3, ignore_past_class=True,
    )
    bg, fg, rl, _ = numpy_oracle(
        p[0], reg[0], anchors, boxes[0], labels[0],
        incremental=True, num_past=3, ignore_past=True,
    )
    np.testing.assert_allclose(float(out.bg_loss[0]), bg, rtol=1e-4)
    np.testing.assert_allclose(float(out.fg_loss[0]), fg, rtol=1e-4)


def test_decrease_positive_default_matches_plain(rng):
    """decrease_positive=1.0 makes the incremental focal weight identical
    to the plain one (losses.py:368-372)."""
    p, reg, anchors, boxes, labels = make_problem(rng)
    a = focal_loss(p, reg, anchors, boxes, labels)
    b = focal_loss(p, reg, anchors, boxes, labels, incremental=True,
                   num_past_class=0)
    np.testing.assert_allclose(float(a.fg_loss[0]), float(b.fg_loss[0]), rtol=1e-5)
    np.testing.assert_allclose(float(a.bg_loss[0]), float(b.bg_loss[0]), rtol=1e-5)


def test_batch_vmap_consistency(rng):
    p, reg, anchors, boxes, labels = make_problem(rng)
    p2 = np.concatenate([p, p])
    reg2 = np.concatenate([reg, reg])
    boxes2 = np.concatenate([boxes, boxes])
    labels2 = np.concatenate([labels, labels])
    out = focal_loss(p2, reg2, anchors, boxes2, labels2)
    np.testing.assert_allclose(np.asarray(out.bg_loss[0]), np.asarray(out.bg_loss[1]))


def test_enhance_on_new_skips_empty_gt_images(rng):
    """The reference skips empty-GT images entirely (continue,
    losses.py:292-306): an all-background image must not add a spurious
    enhance_on_new penalty (r2 fix)."""
    p, reg, anchors, boxes, labels = make_problem(rng)
    p2 = np.stack([p[0], p[0]])
    reg2 = np.stack([reg[0], reg[0]])
    boxes2 = np.stack([boxes[0], np.full_like(boxes[0], -1.0)])
    labels2 = np.stack([labels[0], np.full_like(labels[0], -1)])
    kw = dict(incremental=True, num_past_class=3, enhance_on_new=True)
    both = focal_loss(p2, reg2, anchors, boxes2, labels2, **kw)
    solo = focal_loss(p, reg, anchors, boxes, labels, **kw)
    np.testing.assert_allclose(
        float(both.enhance_on_new_loss), float(solo.enhance_on_new_loss),
        rtol=1e-6,
    )
    # sanity: the term itself is live on the GT-bearing image
    assert float(solo.enhance_on_new_loss) > 0.0
