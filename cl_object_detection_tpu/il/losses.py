"""IL loss composition — the reference's ``IL_Loss`` as a pure function.

The reference's composer (/root/reference/retinanet/losses.py:454-739) is a
stateful object holding a back-pointer to the trainer and dispatching on
~15 config flags. Here it is one pure function

    total, metrics = compute_losses(variables, teacher_variables, batch, ...)

specialized by a frozen :class:`LossStatics` (everything that's a Python
bool/int at trace time) so each (state, batch-kind) combination compiles to
one fused XLA program. Loss-key taxonomy matches the reference exactly
(cls_bg_loss, cls_fg_loss, reg_loss, dist_cls_loss, dist_reg_loss,
dist_feat_loss, sim_loss, enhance_loss, enhance_on_new_loss, mas_loss,
prototype_loss, total_loss) so records/reports line up.

Semantics reproduced (losses.py:515-739, train.py:15-80):
  * plain path (state 0 / replay batch / classifier-warm-stage): focal on
    activated scores; on replay batches the per-image fg losses below
    ``clip_replay_cls_loss`` are dropped from the mean (losses.py:575-582);
  * incremental path: focal on sigmoid(logits); per-image fg losses below
    ``clip_cls_loss`` dropped (losses.py:650-657); distillation from the
    frozen teacher: cosine feature loss summed over the 5 FPN maps
    (mean over B*H*W vectors per map), smooth-L1 (beta=1) regression
    distill on (student-not-positive AND teacher-fg) anchors, MSE
    classification distill on teacher-fg entries — on logits or
    probabilities per ``distill_logits`` (losses.py:677-737);
  * enhance_error on replay batches: mean |p|^k over new-class scores
    > 0.05 (losses.py:591-603);
  * MAS penalty and classifier-similarity loss as separate pure helpers.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import FocalConfig, ILConfig
from ..ops.focal_loss import focal_loss


@dataclass(frozen=True)
class LossStatics:
    """Trace-time-static description of the current (state, batch) kind."""
    num_classes: int
    num_past_class: int = 0
    incremental: bool = False          # cur_state>0 ∧ ¬replay ∧ ¬warm-cls
    is_replay: bool = False
    is_bic: bool = False
    use_distill: bool = False
    distill_logits: bool = False
    use_pseudo_progress: bool = False
    use_enhance_error: bool = False
    enhance_error_method: str = "L2"
    use_enhance_on_new: bool = False
    use_classifier_loss: bool = False
    use_mas: bool = False
    use_prototype: bool = False
    ignore_gd: bool = False
    enhance_only: bool = False         # final-correction objective: backprop
                                       # ONLY the enhance_error term
                                       # (train.py:118-131)


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.sum(mask.astype(jnp.float32))
    return jnp.sum(jnp.where(mask, values, 0.0)) / jnp.maximum(cnt, 1.0)


def _enhance_error(cls: jnp.ndarray, s: "LossStatics") -> jnp.ndarray:
    """New-class score penalty on replay images (losses.py:591-603):
    sum(|p|^k over entries > 0.05) / max(count, 1), k per L1/L2/L3."""
    pn = cls[:, :, s.num_past_class:]
    mask = pn > 0.05
    k = {"L1": 1, "L2": 2, "L3": 3}[s.enhance_error_method.upper()]
    vals = jnp.abs(pn) ** k
    return jnp.sum(jnp.where(mask, vals, 0.0)) / jnp.maximum(
        jnp.sum(mask.astype(jnp.float32)), 1.0
    )


def _clip_fg_mean(fg_per_image: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Mean of per-image fg losses >= threshold; 0 if none survive
    (losses.py:575-582, 650-657)."""
    mask = fg_per_image >= threshold
    cnt = jnp.sum(mask.astype(jnp.float32))
    mean = jnp.sum(jnp.where(mask, fg_per_image, 0.0)) / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt > 0, mean, 0.0)


def _smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def _safe_norm(x, axis=None, eps: float = 1e-12):
    """sqrt(sum(x^2) + eps): jnp.linalg.norm has a NaN gradient at exactly
    zero vectors (which DO occur — e.g. all-ReLU-dead FPN rows in padded
    regions), poisoning the whole backward pass."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def _cosine_feat_loss(feat_s, feat_t) -> jnp.ndarray:
    """CosineEmbeddingLoss(target=1) summed over FPN levels
    (losses.py:684-697): per level, mean over all spatial vectors of
    (1 - cos(student, teacher))."""
    total = 0.0
    for fs, ft in zip(feat_s, feat_t):
        fs = fs.astype(jnp.float32).reshape(-1, fs.shape[-1])
        ft = ft.astype(jnp.float32).reshape(-1, ft.shape[-1])
        num = jnp.sum(fs * ft, axis=-1)
        den = _safe_norm(fs, axis=-1) * _safe_norm(ft, axis=-1)
        cos = num / jnp.maximum(den, 1e-8)
        total = total + jnp.mean(1.0 - cos)
    return total


def mas_penalty(params, prev_params, importance, ratio: float) -> jnp.ndarray:
    """MAS regularizer: sum Ω_i (θ_i - θ_prev_i)^2 * ratio
    (IL_method/mas.py:132-140). ``importance`` has the same tree structure
    as params (missing/None leaves contribute 0 — e.g. the expanded
    classifier output)."""
    def leaf(p, pp, om):
        if om is None or pp is None:
            return 0.0
        p = p.astype(jnp.float32)
        pp = pp.astype(jnp.float32)
        if p.shape != pp.shape:
            return 0.0
        return jnp.sum(om * (p - pp) ** 2)

    losses = jax.tree.map(leaf, params, prev_params, importance,
                          is_leaf=lambda x: x is None)
    return ratio * sum(jax.tree.leaves(losses))


def classifier_vectors_jnp(params, num_anchors: int = 9,
                           head_path=("classification_head", "output")) -> jnp.ndarray:
    """Per-class flattened classifier weights (C, A*kh*kw*cin), as a
    DIFFERENTIABLE function of the param tree (jnp twin of
    models.expand.classifier_class_vectors)."""
    node = params
    for key in head_path:
        node = node[key]
    kernel = node["kernel"].astype(jnp.float32)
    kh, kw, cin, total = kernel.shape
    c = total // num_anchors
    k = kernel.reshape(kh * kw * cin, num_anchors, c)
    return jnp.transpose(k, (2, 1, 0)).reshape(c, num_anchors * kh * kw * cin)


def classifier_similarity_loss(
    new_class_vectors: jnp.ndarray,   # (C_new, D) current new-class weights
    past_class_vectors: jnp.ndarray,  # (C_old, D) frozen teacher weights
    delta: float = 0.5,
) -> jnp.ndarray:
    """Cosine-margin penalty pushing new classifiers away from old ones
    (losses.py:491-513): sum over new classes of
    sum(clamp(|cos(w_new, w_old)| - delta, 0))."""
    pn = _safe_norm(past_class_vectors, axis=1)
    total = 0.0
    for j in range(new_class_vectors.shape[0]):
        w = new_class_vectors[j]
        cos = past_class_vectors @ w / jnp.maximum(pn * _safe_norm(w), 1e-12)
        total = total + jnp.sum(jnp.clip(jnp.abs(cos) - delta, 0.0))
    return total


def compute_losses(
    model_apply,                       # fn(variables, images, enable_act) -> (cls, reg)
    model_apply_with_feats,            # fn(variables, images, enable_act) -> (cls, reg, feats)
    variables: Dict,
    images: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    anchors: jnp.ndarray,
    il_cfg: ILConfig,
    focal_cfg: FocalConfig,
    statics: LossStatics,
    *,
    teacher_apply_with_feats=None,
    teacher_variables: Optional[Dict] = None,
    pseudo_progress: Optional[jnp.ndarray] = None,
    bic_correct=None,                  # fn(logits) -> logits (current state slice)
    mas_prev_params=None,
    mas_importance=None,
    classifier_vectors: Optional[jnp.ndarray] = None,  # teacher (C_old, D)
    prototype_extras: Optional[Dict] = None,  # {apply, old_prototypes, margin, weight}
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    s = statics
    result: Dict[str, jnp.ndarray] = {}

    if not s.incremental:
        # ---------------- plain path (losses.py:556-603) ----------------
        if bic_correct is not None:
            logits, regression = model_apply(variables, images, False)
            cls = jax.nn.sigmoid(bic_correct(logits))
        else:
            cls, regression = model_apply(variables, images, True)

        if s.enhance_only:
            # final correction (reference correction_new_class,
            # train.py:118-131): the enhance_error term is the WHOLE loss —
            # no focal/reg/distill terms contribute gradients
            result["enhance_loss"] = _enhance_error(cls, s)
            total = result["enhance_loss"]
            metrics = dict(result)
            metrics["total_loss"] = total
            return total, metrics

        out = focal_loss(
            cls, regression, anchors, gt_boxes, gt_labels,
            alpha=focal_cfg.alpha, gamma=focal_cfg.gamma,
            fg_iou=focal_cfg.fg_iou, bg_iou=focal_cfg.bg_iou,
            bbox_std=tuple(focal_cfg.bbox_std),
        )
        if il_cfg.clip_loss and s.is_replay:
            result["cls_fg_loss"] = _clip_fg_mean(out.fg_loss, il_cfg.clip_replay_cls_loss)
        else:
            result["cls_fg_loss"] = jnp.mean(out.fg_loss)
        result["cls_bg_loss"] = jnp.mean(out.bg_loss)
        result["reg_loss"] = jnp.mean(out.reg_loss)

        if s.use_enhance_error and s.is_replay and not s.is_bic:
            result["enhance_loss"] = _enhance_error(cls, s)
    else:
        # -------------- incremental path (losses.py:605-737) ------------
        unfolded = None
        if s.use_prototype and prototype_extras is not None:
            # forward_prototype path (losses.py:607-612): also produce the
            # 3x3-unfolded classification-trunk features
            logits, regression, feats, unfolded = prototype_extras["apply"](
                variables, images
            )
        else:
            logits, regression, feats = model_apply_with_feats(
                variables, images, False
            )
        if bic_correct is not None:
            logits = bic_correct(logits)
        cls = jax.nn.sigmoid(logits)

        out = focal_loss(
            cls, regression, anchors, gt_boxes, gt_labels,
            alpha=focal_cfg.alpha, gamma=focal_cfg.gamma,
            num_past_class=s.num_past_class, incremental=True,
            ignore_past_class=il_cfg.ignore_past_class,
            new_ignore_past_class=il_cfg.new_ignore_past_class,
            decrease_positive=il_cfg.decrease_positive,
            decrease_positive_by_iou=il_cfg.decrease_positive_by_iou,
            enhance_on_new=s.use_enhance_on_new,
            pseudo_progress=pseudo_progress if s.use_pseudo_progress else None,
            fg_iou=focal_cfg.fg_iou, bg_iou=focal_cfg.bg_iou,
            bbox_std=tuple(focal_cfg.bbox_std),
        )
        if il_cfg.clip_loss:
            result["cls_fg_loss"] = _clip_fg_mean(out.fg_loss, il_cfg.clip_cls_loss)
        else:
            result["cls_fg_loss"] = jnp.mean(out.fg_loss)
        result["cls_bg_loss"] = jnp.mean(out.bg_loss)
        result["reg_loss"] = jnp.mean(out.reg_loss)
        if s.use_enhance_on_new:
            result["enhance_on_new_loss"] = out.enhance_on_new_loss

        if s.use_prototype and prototype_extras is not None and unfolded is not None:
            from .prototype import prototype_loss_from_batch

            result["prototype_loss"] = prototype_loss_from_batch(
                unfolded,
                ~out.bg_mask,
                out.pos_label,
                prototype_extras["old_prototypes"],
                num_past_class=s.num_past_class,
                num_new_class=s.num_classes - s.num_past_class,
                margin=prototype_extras.get("margin", 600.0),
                weight=prototype_extras.get("weight", 0.1),
            )

        if s.use_distill:
            assert teacher_apply_with_feats is not None and teacher_variables is not None
            t_logits, t_reg, t_feats = teacher_apply_with_feats(
                teacher_variables, images, False
            )
            t_logits = jax.lax.stop_gradient(t_logits)
            t_reg = jax.lax.stop_gradient(t_reg)
            t_feats = jax.tree.map(jax.lax.stop_gradient, t_feats)

            result["dist_feat_loss"] = _cosine_feat_loss(feats, t_feats)

            s_old = logits[:, :, : s.num_past_class]       # old-class slice
            t_prob = jax.nn.sigmoid(t_logits)
            if s.distill_logits:
                s_cmp, t_cmp = s_old, t_logits
            else:
                s_cmp, t_cmp = jax.nn.sigmoid(s_old), t_prob
            t_fg = t_prob > 0.05                            # (B, A, C_old)

            reg_mask = out.bg_mask & jnp.any(t_fg, axis=2)  # (B, A)
            reg_diff = _smooth_l1(t_reg - regression, beta=1.0)
            result["dist_reg_loss"] = jnp.sum(
                jnp.where(reg_mask[..., None], reg_diff, 0.0)
            ) / jnp.maximum(jnp.sum(reg_mask.astype(jnp.float32)) * 4.0, 1.0)

            # ignore_GD: MSE over ALL old-class entries at reg_mask anchors
            # (reference losses.py:725-726 indexes [reg_mask], which keeps
            # every C_old column); otherwise teacher-fg entries only (:728)
            if s.ignore_gd:
                cls_mask = jnp.broadcast_to(reg_mask[..., None], t_fg.shape)
            else:
                cls_mask = t_fg
            result["dist_cls_loss"] = _masked_mean((t_cmp - s_cmp) ** 2, cls_mask)

            if s.use_classifier_loss and classifier_vectors is not None:
                # classifier_vectors = the TEACHER's (C_old, D) matrix;
                # the student's new-class vectors come from params so the
                # margin penalty backpropagates (losses.py:491-513)
                past_vecs = classifier_vectors
                cur = classifier_vectors_jnp(variables["params"])
                new_vecs = cur[s.num_past_class:]
                result["sim_loss"] = classifier_similarity_loss(
                    new_vecs, past_vecs, il_cfg.classifier_loss_delta
                )

    if s.use_mas and mas_importance is not None and mas_prev_params is not None:
        result["mas_loss"] = mas_penalty(
            variables["params"], mas_prev_params, mas_importance, il_cfg.mas.ratio
        )

    total = sum(result.values())
    metrics = dict(result)
    metrics["total_loss"] = total
    return total, metrics
