"""Prototype feature anchoring + prototype-herd exemplar selection.

Re-implements /root/reference/IL_method/prototype.py and the prototype
term of ``ProtoTypeFocalLoss`` (/root/reference/retinanet/losses.py:23-250):

  * prototypes: per (class, anchor-slot) mean of the 3x3-unfolded
    classification-trunk features (256*9 = 2304 dims) over positive
    anchors of the whole dataset (prototype.py:49-141) — shape (C, 9, D);
  * prototype LOSS (losses.py:213-245): per batch, build the NEW classes'
    current prototypes from positive anchors, average over the 9 anchor
    slots, and push them at least ``margin`` (600) L2 away from every
    stored OLD prototype: mean(relu(margin - dist)) * weight (0.1),
    enabled after epoch 5;
  * prototype-herd sampling, two modes (``ReplayConfig.prototype_herd_mode``):
    ``classmean`` ranks a class's images once by distance between the
    image's slot-averaged class feature and the slot-averaged prototype
    (a documented simplification, round-1/2 default); ``slots`` is the
    faithful reference semantics (prototype.py:143-220 +
    train/il_trainer.py:173-225): rank images per (class, anchor-slot)
    against the per-slot prototype, order slots by positive count, and
    distribute the per-class budget round-robin across slot ranks.

Documented divergences (SURVEY.md §7 hard-part 7): the reference's
ProtoTypeFocalLoss references an undefined ``bg_losses`` in its empty-GT
branch (losses.py:151-152, dead/buggy) and its distance broadcast only
works for 1 new class; both are implemented correctly/generally here.
Old-class positives from pseudo-labels are masked out instead of wrapping
negatively into the bin index.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import positive_assignment


def make_batch_prototype_fn(model, num_classes: int, num_anchors: int = 9):
    """Jitted: batch -> (sum_features (C, 9, D), counts (C, 9)) over
    positive anchors. Labels are final-state contiguous ids. Anchors are
    a traced argument (per-frame grids)."""

    @jax.jit
    def step(variables, anchors, images, boxes, labels):
        cls, reg, feats, unfolded = model.apply(
            variables, images, method="classification_features"
        )
        # unfolded: (B, cells, D); anchor k -> (cell k//9, slot k%9)
        B, cells, D = unfolded.shape

        def per_image(feat, boxes_i, labels_i):
            pos, a_label = positive_assignment(anchors, boxes_i, labels_i)
            pos_cs = pos.reshape(cells, num_anchors)           # (cells, 9)
            lab_cs = a_label.reshape(cells, num_anchors)
            onehot = jax.nn.one_hot(
                jnp.clip(lab_cs, 0, num_classes - 1), num_classes, dtype=jnp.float32
            ) * (pos_cs & (lab_cs >= 0))[..., None]            # (cells, 9, C)
            sums = jnp.einsum("csk,cd->ksd", onehot, feat)     # (C, 9, D)
            counts = jnp.sum(onehot, axis=0).T                 # (C, 9)
            return sums, counts

        sums, counts = jax.vmap(per_image)(unfolded, boxes, labels)
        return jnp.sum(sums, axis=0), jnp.sum(counts, axis=0)

    return step


def compute_prototype_features(
    model, variables, anchors, loader, num_classes: int, mesh=None
) -> np.ndarray:
    """Dataset pass -> (C, 9, D) prototype features (prototype.py:107-141).

    With ``mesh`` (single-process), batches shard over ``data``; the
    (C, 9, D) sums are batch reductions, psum'ed by GSPMD."""
    from ..ops.anchors import as_anchor_provider
    from ..parallel.mesh import tool_placers

    put, rep = tool_placers(mesh)
    variables = rep(variables)
    provider = as_anchor_provider(anchors)
    step = make_batch_prototype_fn(model, num_classes)
    total = None
    counts = None
    for batch in loader:
        s, c = step(variables, rep(jnp.asarray(provider(batch.images))),
                    put(batch.images),
                    put(batch.boxes), put(batch.labels))
        s, c = np.asarray(s, np.float64), np.asarray(c, np.float64)
        total = s if total is None else total + s
        counts = c if counts is None else counts + c
    if total is None:
        raise ValueError("empty loader for prototype computation")
    return (total / np.clip(counts[..., None], 1.0, None)).astype(np.float32)


def prototype_loss_from_batch(
    unfolded: jnp.ndarray,          # (B, cells, D)
    pos_mask: jnp.ndarray,          # (B, A) positive anchors
    assigned_label: jnp.ndarray,    # (B, A) final-state labels
    old_prototypes: jnp.ndarray,    # (C_old, D): stored prototypes, slot-avg
    num_past_class: int,
    num_new_class: int,
    num_anchors: int = 9,
    margin: float = 600.0,
    weight: float = 0.1,
) -> jnp.ndarray:
    """The batch prototype term (losses.py:213-245), generalized to any
    number of new classes."""
    B, cells, D = unfolded.shape
    pos = pos_mask.reshape(B, cells, num_anchors)
    lab = assigned_label.reshape(B, cells, num_anchors) - num_past_class
    sel = pos & (lab >= 0) & (lab < num_new_class)
    onehot = jax.nn.one_hot(
        jnp.clip(lab, 0, num_new_class - 1), num_new_class, dtype=jnp.float32
    ) * sel[..., None]                                         # (B, cells, 9, K)
    sums = jnp.einsum("bcsk,bcd->ksd", onehot, unfolded)       # (K, 9, D)
    counts = jnp.transpose(jnp.sum(onehot, axis=(0, 1)))       # (K, 9)
    cur = sums / jnp.maximum(counts[..., None], 1.0)
    cur = jnp.mean(cur, axis=1)                                # (K, D)
    diff = cur[:, None, :] - old_prototypes[None]
    # eps inside the sqrt: a zero distance (e.g. an all-zero prototype for
    # a class with no positives) would otherwise produce NaN gradients
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=2) + 1e-8)
    return jnp.mean(jnp.clip(margin - dist, 0.0)) * weight


def make_image_feature_fn(model, num_classes: int, num_anchors: int = 9):
    """Jitted: batch -> per-image ((B, C, D) class features, (B, C)
    positive-anchor counts). An image's class feature is the mean unfolded
    feature over that class's positive (cell, slot) pairs — the quantity
    prototype-herd sampling scores against (prototype.py:143-220)."""

    @jax.jit
    def step(variables, anchors, images, boxes, labels):
        cls, reg, feats, unfolded = model.apply(
            variables, images, method="classification_features"
        )
        B, cells, D = unfolded.shape

        def per_image(feat, boxes_i, labels_i):
            pos, a_label = positive_assignment(anchors, boxes_i, labels_i)
            pos_cs = pos.reshape(cells, num_anchors)
            lab_cs = a_label.reshape(cells, num_anchors)
            onehot = jax.nn.one_hot(
                jnp.clip(lab_cs, 0, num_classes - 1), num_classes,
                dtype=jnp.float32,
            ) * (pos_cs & (lab_cs >= 0))[..., None]            # (cells, 9, C)
            w = jnp.sum(onehot, axis=1)                        # (cells, C)
            sums = jnp.einsum("ck,cd->kd", w, feat)            # (C, D)
            counts = jnp.sum(w, axis=0)                        # (C,)
            return sums / jnp.maximum(counts[:, None], 1.0), counts

        return jax.vmap(per_image)(unfolded, boxes, labels)

    return step


def make_image_slot_feature_fn(model, num_classes: int, num_anchors: int = 9):
    """Jitted: batch -> per-image ((B, C, 9, D) per-slot class features,
    (B, C, 9) positive counts). The per-(class, slot) mean unfolded feature
    is what the reference ranks exemplars against (prototype.py:77-98,
    176-190: ``feats`` is the per-image ``feat / clamp(num, 1)``)."""

    @jax.jit
    def step(variables, anchors, images, boxes, labels):
        cls, reg, feats, unfolded = model.apply(
            variables, images, method="classification_features"
        )
        B, cells, D = unfolded.shape

        def per_image(feat, boxes_i, labels_i):
            pos, a_label = positive_assignment(anchors, boxes_i, labels_i)
            pos_cs = pos.reshape(cells, num_anchors)
            lab_cs = a_label.reshape(cells, num_anchors)
            onehot = jax.nn.one_hot(
                jnp.clip(lab_cs, 0, num_classes - 1), num_classes,
                dtype=jnp.float32,
            ) * (pos_cs & (lab_cs >= 0))[..., None]            # (cells, 9, C)
            sums = jnp.einsum("csk,cd->ksd", onehot, feat)     # (C, 9, D)
            counts = jnp.sum(onehot, axis=0).T                 # (C, 9)
            return sums / jnp.maximum(counts[..., None], 1.0), counts

        return jax.vmap(per_image)(unfolded, boxes, labels)

    return step


def prototype_herd_slot_scores(
    model, variables, anchors, dataset, data_cfg,
    prototypes: np.ndarray,          # (C, 9, D)
    mesh=None,
):
    """Faithful per-(class, anchor-slot) ranking data for ``slots`` mode
    (prototype.py:176-217). Returns ``(scores, counts)``:

      * ``scores[cls][slot] = {img_id: L2 distance}`` for images with at
        least one positive anchor of ``cls`` in ``slot`` (the reference's
        ``has_target_mask``/``nonzero()`` filter);
      * ``counts`` (C, 9) float64 — total positive anchors per slot over
        the dataset, the reference's pickled ``count`` used to rank slots.
    """
    from ..data.loader import BatchLoader
    from ..ops.anchors import as_anchor_provider
    from ..parallel.mesh import tool_placers

    num_classes, num_anchors = prototypes.shape[:2]
    put, rep = tool_placers(mesh)
    variables = rep(variables)
    provider = as_anchor_provider(anchors)
    step = make_image_slot_feature_fn(model, num_classes, num_anchors)
    scores = {c: {s: {} for s in range(num_anchors)} for c in range(num_classes)}
    counts = np.zeros((num_classes, num_anchors), np.float64)
    loader = BatchLoader(dataset, data_cfg, shuffle=False, augment=False)
    seen = set()
    for batch in loader:
        feat, cnt = step(
            variables,
            rep(jnp.asarray(provider(batch.images))),
            put(batch.images), put(batch.boxes), put(batch.labels),
        )
        feat, cnt = np.asarray(feat), np.asarray(cnt)  # (B,C,9,D),(B,C,9)
        for b, img_id in enumerate(batch.image_ids.tolist()):
            if img_id in seen:
                continue
            seen.add(img_id)
            counts += cnt[b]
            for c, s in zip(*np.nonzero(cnt[b])):
                scores[int(c)][int(s)][img_id] = float(
                    np.linalg.norm(feat[b, c, s] - prototypes[c, s])
                )
    return scores, counts


def sample_by_slot_scores(
    scores, counts: np.ndarray, per_num: int, classes,
    already: Optional[List[int]] = None,
    exclude: Optional[set] = None,
    num_anchors: int = 9,
) -> Dict[int, List[int]]:
    """The reference's slot-ordered pick distribution
    (train/il_trainer.py:197-223): the per-class budget ``per_num`` is
    split round-robin over slot *ranks* (rank = slots sorted by positive
    count, descending); each rank takes its share closest-first from that
    slot's list, skipping already-taken and excluded (future-class)
    images. ``classes`` restricts to the state's new classes (the only
    ones ``cal_examplar`` writes, prototype.py:209)."""
    taken = set(already or [])
    exclude = exclude or set()
    share = [0] * num_anchors
    i = 0
    for _ in range(per_num):
        share[i] += 1
        i = (i + 1) % num_anchors
    out: Dict[int, List[int]] = {}
    for cls in classes:
        ranked = np.argsort(-counts[cls], kind="stable")
        picked: List[int] = []
        for idx, slot in enumerate(ranked):
            need = share[idx]
            if need == 0:
                continue
            slot_scores = scores[cls][int(slot)]
            for img_id in sorted(slot_scores, key=slot_scores.get):
                if img_id in taken or img_id in exclude:
                    continue
                picked.append(img_id)
                taken.add(img_id)
                need -= 1
                if need == 0:
                    break
        if picked:
            out[cls] = picked
    return out


def prototype_herd_scores(
    model, variables, anchors, dataset, data_cfg,
    prototypes: np.ndarray,          # (C, 9, D)
    mesh=None,
) -> Dict[int, Dict[int, float]]:
    """Per (class, image) distance scores for prototype-herd sampling
    (prototype.py:143-220): an image's class feature = mean unfolded
    feature over that class's positive anchors; score = L2 distance to the
    slot-averaged class prototype. One jitted call per batch (the reference
    — and this module before round 2 — ran one forward per image); with
    ``mesh`` (single-process) the batch additionally shards over ``data``."""
    from ..data.loader import BatchLoader

    from ..ops.anchors import as_anchor_provider
    from ..parallel.mesh import tool_placers

    num_classes = prototypes.shape[0]
    put, rep = tool_placers(mesh)
    variables = rep(variables)
    provider = as_anchor_provider(anchors)
    step = make_image_feature_fn(model, num_classes)
    proto_mean = prototypes.mean(axis=1)                       # (C, D)
    loader = BatchLoader(dataset, data_cfg, shuffle=False, augment=False)
    scores: Dict[int, Dict[int, float]] = {c: {} for c in range(num_classes)}
    seen = set()
    for batch in loader:
        feat, cnt = step(
            variables,
            rep(jnp.asarray(provider(batch.images))),
            put(batch.images), put(batch.boxes), put(batch.labels),
        )
        feat, cnt = np.asarray(feat), np.asarray(cnt)          # (B,C,D),(B,C)
        for b, img_id in enumerate(batch.image_ids.tolist()):
            if img_id in seen:
                continue
            seen.add(img_id)
            for cls in np.where(cnt[b] > 0)[0]:
                scores[int(cls)][img_id] = float(
                    np.linalg.norm(feat[b, cls] - proto_mean[cls])
                )
    return scores


def sample_by_scores(
    scores: Dict[int, Dict[int, float]], per_num: int,
    already: Optional[List[int]] = None,
) -> Dict[int, List[int]]:
    """Closest-first per class, no reuse (same as herding's final step)."""
    taken = set(already or [])
    out: Dict[int, List[int]] = {}
    for cls, img_score in scores.items():
        picked = []
        for img_id in sorted(img_score, key=img_score.get):
            if img_id in taken:
                continue
            picked.append(img_id)
            taken.add(img_id)
            if len(picked) == per_num:
                break
        if picked:
            out[cls] = picked
    return out
