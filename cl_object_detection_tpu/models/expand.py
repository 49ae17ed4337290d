"""Classifier expansion between incremental states — pure param surgery.

Re-implements ``ClassificationModel.next_state``
(/root/reference/retinanet/model.py:216-271) as a functional transform on
the flax param tree. The reference's output conv stores classes
ANCHOR-MAJOR (channel = a*C + c) and its weight-copy loop preserves that
interleaving (model.py:236-238); here the kernel's last axis is reshaped
to (A, C) so the copy is a single slice assignment.

Warm-start methods (model.py:241-262):
  * ``mean``: each new class = similarity-weighted mixture of old-class
    filters (+ prior-bias accumulation);
  * ``large``: copy the most-similar old class's filter verbatim;
  * ``onlyNegative``: copy only the negative weights of the most-similar
    old class (the reference hardcodes ``max_idx = 12`` immediately after
    computing the argmax — an evident bug we do NOT reproduce; the argmax
    is used);
  * anything else: prior-bias init only.

Changing the output-channel count means a new jit specialization per
state — states are few, this is by design (SURVEY.md §7 hard-part 2).
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def expand_classifier(
    params: dict,
    num_new_classes: int,
    *,
    num_anchors: int = 9,
    prior: float = 0.01,
    similarity: Optional[np.ndarray] = None,   # (num_new, num_old)
    method: str = "mean",
    head_path: str = "classification_head",
) -> dict:
    """Returns a NEW param tree with the classification output conv grown by
    ``num_new_classes``. Input tree is not mutated."""
    import copy

    out = copy.deepcopy(params)
    node = out
    for key in head_path.split("/"):
        node = node[key]
    output = node["output"]

    kernel = np.asarray(output["kernel"])          # (kh, kw, cin, A*C_old)
    bias = np.asarray(output["bias"])              # (A*C_old,)
    kh, kw, cin, total = kernel.shape
    c_old = total // num_anchors
    c_new = c_old + num_new_classes
    bias_val = -math.log((1.0 - prior) / prior)

    k_old = kernel.reshape(kh, kw, cin, num_anchors, c_old)
    b_old = bias.reshape(num_anchors, c_old)

    k_new = np.zeros((kh, kw, cin, num_anchors, c_new), kernel.dtype)
    b_new = np.full((num_anchors, c_new), bias_val, bias.dtype)
    k_new[..., :c_old] = k_old
    b_new[:, :c_old] = b_old

    if similarity is not None and method in ("mean", "large", "onlyNegative"):
        sim = np.asarray(similarity, np.float32)
        if method == "mean":
            for j in range(num_new_classes):
                for i, ratio in enumerate(sim[j]):
                    k_new[..., c_old + j] += ratio * k_old[..., i]
                    b_new[:, c_old + j] += ratio * b_old[:, i]
        elif method == "large":
            for j in range(num_new_classes):
                i = int(np.argmax(sim[j]))
                k_new[..., c_old + j] = k_old[..., i]
                b_new[:, c_old + j] = b_old[:, i]
        elif method == "onlyNegative":
            for j in range(num_new_classes):
                i = int(np.argmax(sim[j]))
                w = k_old[..., i]
                k_new[..., c_old + j] = np.where(w < 0, w, 0.0)

    node["output"] = {
        "kernel": jnp.asarray(k_new.reshape(kh, kw, cin, num_anchors * c_new)),
        "bias": jnp.asarray(b_new.reshape(num_anchors * c_new)),
    }
    return out


def classifier_class_vectors(params: dict, num_anchors: int = 9,
                             head_path: str = "classification_head") -> np.ndarray:
    """Per-class flattened classifier weights, de-interleaved across the
    anchor slots: (C, A*kh*kw*cin). Used by the classifier-similarity loss
    (losses.py:472-489) and the weight diagnostics
    (experimental/visualize_classifier.py:9-34)."""
    node = params
    for key in head_path.split("/"):
        node = node[key]
    kernel = np.asarray(node["output"]["kernel"])  # (kh, kw, cin, A*C)
    kh, kw, cin, total = kernel.shape
    c = total // num_anchors
    k = kernel.reshape(kh * kw * cin, num_anchors, c)
    return np.transpose(k, (2, 1, 0)).reshape(c, num_anchors * kh * kw * cin)
