"""Herding exemplar selection.

Re-implements /root/reference/IL_method/herd_sample.py: for the PREVIOUS
state's training set,
  1. per (image, class): foreground-area ratio via pairwise
     inclusion-exclusion over that class's boxes (herd_sample.py:208-242 —
     an approximation: sum of areas minus lower-tri pairwise intersections);
     keep pairs with ratio >= 0.25 (herd_sample.py:13);
  2. per class: mean FPN feature over its kept images — each image's
     5 FPN maps resized to fixed squares [132, 66, 33, 17, 9], flattened
     and concatenated (herd_sample.py:27-37);
  3. score each kept image by L2 distance to its class mean, excluding
     images containing FUTURE classes (herd_sample.py:174-198);
  4. pick the per_num closest per class, no image reused across classes
     (herd_sample.py:157-172).

Feature extraction is batched + jitted (the reference did one image per
forward).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

FEATURE_SIZES = (132, 66, 33, 17, 9)
RATIO_THRESHOLD = 0.25


def foreground_ratio(boxes: np.ndarray, labels: np.ndarray, img_area: float) -> Dict[int, float]:
    """Per-class fg-area ratio by inclusion-exclusion over pairs."""
    out: Dict[int, float] = {}
    for cls in np.unique(labels[labels >= 0]):
        bb = boxes[labels == cls]
        # pairwise intersections
        x1 = np.maximum(bb[:, None, 0], bb[None, :, 0])
        y1 = np.maximum(bb[:, None, 1], bb[None, :, 1])
        x2 = np.minimum(bb[:, None, 2], bb[None, :, 2])
        y2 = np.minimum(bb[:, None, 3], bb[None, :, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = float(np.trace(inter)) - float(np.tril(inter, -1).sum())
        out[int(cls)] = area / max(img_area, 1.0)
    return out


def make_feature_fn(model):
    """Jitted: images -> per-image flattened multi-scale feature vector."""

    @jax.jit
    def features(variables, images):
        feats = model.apply(variables, images, method="forward_features")
        parts = []
        for f, s in zip(feats, FEATURE_SIZES):
            f = f.astype(jnp.float32)
            r = jax.image.resize(f, (f.shape[0], s, s, f.shape[3]), "bilinear")
            parts.append(r.reshape(f.shape[0], -1))
        return jnp.concatenate(parts, axis=1)

    return features


class HerdSampler:
    """Stateful exemplar book-keeping across states (herd_sample.py:40-58)."""

    def __init__(self, model, ratio_threshold: float = RATIO_THRESHOLD):
        self.model = model
        self.ratio_threshold = ratio_threshold
        self.examplar_dict: Dict[int, List[int]] = defaultdict(list)
        self.examplar_list: List[int] = []
        self._feature_fn = make_feature_fn(model)

    # ------------------------------------------------------------------
    def sample(
        self,
        variables,
        dataset,                  # ILDataset over the PREVIOUS state (train split)
        data_cfg,
        per_num: int,
        future_img_ids: Sequence[int] = (),
        mesh=None,
    ) -> Dict[int, List[int]]:
        from ..data.loader import BatchLoader
        from ..parallel.mesh import tool_placers

        put, rep = tool_placers(mesh)
        variables = rep(variables)
        future = set(future_img_ids)

        # 1. classify images by fg ratio
        classified: Dict[int, List[int]] = defaultdict(list)
        for i in range(len(dataset)):
            img_id = dataset.image_ids[i]
            boxes, labels, _ = dataset.load_annotations(i)
            h, w = dataset.image_size(i)
            for cls, ratio in foreground_ratio(boxes, labels, float(h * w)).items():
                if ratio >= self.ratio_threshold:
                    classified[cls].append(img_id)

        img_classes: Dict[int, List[int]] = defaultdict(list)
        for cls, ids in classified.items():
            for img_id in ids:
                img_classes[img_id].append(cls)

        # 2-3. batched features -> class means -> distances, in TWO
        # STREAMING passes: one ~24 MB vector per image (23239 cells x 256
        # ch) means caching the whole dataset would be O(images) host RAM
        # (~95 GB at VOC scale); streaming keeps O(classes) like the
        # reference's running-mean pickles (herd_sample.py:27-37). With a
        # (single-process) mesh the image batch shards over 'data' — FPN
        # feature extraction is per-image, so DP herding needs no
        # collectives.
        loader = BatchLoader(dataset, data_cfg, shuffle=False, augment=False)

        sums: Dict[int, np.ndarray] = {}
        counts: Dict[int, int] = defaultdict(int)
        done = set()
        for batch in loader:                       # pass 1: class means
            f = np.asarray(self._feature_fn(variables, put(batch.images)))
            for b, img_id in enumerate(batch.image_ids.tolist()):
                if img_id in done or img_id not in img_classes:
                    continue
                done.add(img_id)
                for cls in img_classes[img_id]:
                    if cls in sums:
                        sums[cls] += f[b]
                    else:
                        sums[cls] = f[b].astype(np.float32).copy()
                    counts[cls] += 1
        means = {c: sums[c] / counts[c] for c in sums}

        scores: Dict[int, Dict[int, float]] = {c: {} for c in classified}
        done = set()
        for batch in loader:                       # pass 2: distances
            f = np.asarray(self._feature_fn(variables, put(batch.images)))
            for b, img_id in enumerate(batch.image_ids.tolist()):
                if img_id in done or img_id not in img_classes:
                    continue
                done.add(img_id)
                if img_id in future:
                    continue
                for cls in img_classes[img_id]:
                    if cls in means:
                        scores[cls][img_id] = float(
                            np.linalg.norm(means[cls] - f[b])
                        )

        # 4. pick closest per class without reuse (herd_sample.py:157-172)
        new_dict: Dict[int, List[int]] = defaultdict(list)
        for cls, img_score in scores.items():
            count = 0
            for img_id in sorted(img_score, key=img_score.get):
                if img_id in self.examplar_list:
                    continue
                new_dict[cls].append(img_id)
                self.examplar_list.append(img_id)
                count += 1
                if count == per_num:
                    break
        for cls, ids in new_dict.items():
            self.examplar_dict[cls].extend(ids)
        return dict(new_dict)
