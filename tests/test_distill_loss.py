"""Distillation classification-loss mask semantics (reference
losses.py:709-728), via fake apply fns + an independent numpy oracle.

Pins the r2 fix: with ``ignore_GD`` the reference indexes
``prev_classification[reg_mask]`` — ALL old-class columns at reg_mask
anchors — not the intersection with the teacher-fg mask.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cl_object_detection_tpu.config import FocalConfig, ILConfig
from cl_object_detection_tpu.il.losses import LossStatics, compute_losses

B, A, C_OLD, C_NEW = 2, 60, 3, 2
C = C_OLD + C_NEW


@pytest.fixture
def problem():
    rng = np.random.RandomState(0)
    anchors = np.zeros((A, 4), np.float32)
    cx, cy = rng.rand(A) * 200, rng.rand(A) * 200
    w = 20 + rng.rand(A) * 40
    anchors[:, 0], anchors[:, 1] = cx - w / 2, cy - w / 2
    anchors[:, 2], anchors[:, 3] = cx + w / 2, cy + w / 2
    boxes = np.full((B, 4, 4), -1, np.float32)
    labels = np.full((B, 4), -1, np.int32)
    boxes[:, 0] = anchors[5]         # one GT right on an anchor
    labels[:, 0] = C_OLD             # a NEW class (incremental state)
    logits = rng.randn(B, A, C).astype(np.float32)
    reg = rng.randn(B, A, 4).astype(np.float32) * 0.1
    t_logits = rng.randn(B, A, C_OLD).astype(np.float32)
    t_reg = rng.randn(B, A, 4).astype(np.float32) * 0.1
    feats = [rng.randn(B, 4, 4, 8).astype(np.float32) for _ in range(2)]
    return anchors, boxes, labels, logits, reg, t_logits, t_reg, feats


def _run(problem, ignore_gd, distill_logits=False):
    anchors, boxes, labels, logits, reg, t_logits, t_reg, feats = problem

    def apply_feats(variables, images, act):
        assert not act
        return jnp.asarray(logits), jnp.asarray(reg), [jnp.asarray(f) for f in feats]

    def t_apply_feats(variables, images, act):
        return jnp.asarray(t_logits), jnp.asarray(t_reg), [jnp.asarray(f) for f in feats]

    statics = LossStatics(
        num_classes=C, num_past_class=C_OLD, incremental=True,
        use_distill=True, distill_logits=distill_logits, ignore_gd=ignore_gd,
    )
    total, metrics = compute_losses(
        None, apply_feats, {"params": {}, "batch_stats": {}},
        jnp.zeros((B, 8, 8, 3)), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(anchors), ILConfig(), FocalConfig(), statics,
        teacher_apply_with_feats=t_apply_feats, teacher_variables={},
    )
    return metrics


def _oracle_masks(problem):
    """bg_mask (not-positive anchors) and teacher-fg mask, numpy."""
    anchors, boxes, labels, logits, reg, t_logits, t_reg, _ = problem
    t_prob = 1 / (1 + np.exp(-t_logits))
    t_fg = t_prob > 0.05
    # positives: IoU >= 0.5 with the single GT box (GT == anchors[5])
    bg_mask = np.ones((B, A), bool)
    for b in range(B):
        gt = boxes[b, 0]
        x1 = np.maximum(anchors[:, 0], gt[0]); y1 = np.maximum(anchors[:, 1], gt[1])
        x2 = np.minimum(anchors[:, 2], gt[2]); y2 = np.minimum(anchors[:, 3], gt[3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a_area = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
        g_area = (gt[2] - gt[0]) * (gt[3] - gt[1])
        iou = inter / np.clip(a_area + g_area - inter, 1e-8, None)
        bg_mask[b] = iou < 0.5
    reg_mask = bg_mask & t_fg.any(axis=2)
    return reg_mask, t_fg, t_prob


def test_default_mask_is_teacher_fg(problem):
    metrics = _run(problem, ignore_gd=False)
    reg_mask, t_fg, t_prob = _oracle_masks(problem)
    _, _, _, logits, _, t_logits, _, _ = problem
    s_prob = 1 / (1 + np.exp(-logits[:, :, :C_OLD]))
    sq = (t_prob - s_prob) ** 2
    expected = sq[t_fg].mean()
    np.testing.assert_allclose(float(metrics["dist_cls_loss"]), expected,
                               rtol=1e-5)


def test_ignore_gd_uses_all_entries_at_reg_mask(problem):
    metrics = _run(problem, ignore_gd=True)
    reg_mask, t_fg, t_prob = _oracle_masks(problem)
    _, _, _, logits, _, t_logits, _, _ = problem
    s_prob = 1 / (1 + np.exp(-logits[:, :, :C_OLD]))
    sq = (t_prob - s_prob) ** 2
    # reference losses.py:725-726: MSELoss over [reg_mask] — every old-
    # class column of the selected anchors, including teacher-bg entries
    expected = sq[reg_mask].mean()
    np.testing.assert_allclose(float(metrics["dist_cls_loss"]), expected,
                               rtol=1e-5)
    assert reg_mask.sum() > 0 and (t_fg[reg_mask].mean() < 1.0), \
        "fixture must include teacher-bg entries at reg_mask anchors"


def test_ignore_gd_logits_variant(problem):
    metrics = _run(problem, ignore_gd=True, distill_logits=True)
    reg_mask, t_fg, t_prob = _oracle_masks(problem)
    _, _, _, logits, _, t_logits, _, _ = problem
    sq = (t_logits - logits[:, :, :C_OLD]) ** 2
    expected = sq[reg_mask].mean()
    np.testing.assert_allclose(float(metrics["dist_cls_loss"]), expected,
                               rtol=1e-5)
