"""SCAIL-style classifier weight standardization.

The reference's IL_method/scail.py is an unfinished stub (an empty class
plus a ranked-mean helper, scail.py:7-35) — SURVEY.md §2 #27 reads it as a
capability signal: standardizing new-state classifier weights against the
old states' weight statistics. This module implements that capability
completely:

  * ``ranked_mean``: per-class weights sorted descending, averaged across
    classes -> the "canonical" sorted weight profile (scail.py:7-24);
  * ``standardize_new_classifier``: rescale each new class's weight vector
    so its sorted profile matches the old classes' ranked mean (the SCAIL
    idea: new-class weights trained on few states are statistically larger
    / smaller than old ones; align their distributions).
"""
from __future__ import annotations

import numpy as np

from ..models.expand import classifier_class_vectors


def ranked_mean(class_vectors: np.ndarray) -> np.ndarray:
    """(C, D) -> (D,) mean of per-class descending-sorted weights."""
    s = -np.sort(-class_vectors, axis=1)
    return s.mean(axis=0)


def standardize_new_classifier(
    params: dict,
    num_past_class: int,
    num_anchors: int = 9,
    head_path: str = "classification_head",
) -> dict:
    """Rescale new-class output-conv filters so their weight-magnitude
    profile matches the old classes' ranked mean. Returns a new tree."""
    import copy

    import jax.numpy as jnp

    out = copy.deepcopy(params)
    node = out
    for key in head_path.split("/"):
        node = node[key]
    kernel = np.asarray(node["output"]["kernel"])
    kh, kw, cin, total = kernel.shape
    c = total // num_anchors

    vecs = classifier_class_vectors(params, num_anchors, head_path)  # (C, D)
    old_profile = ranked_mean(vecs[:num_past_class])
    old_norm = np.linalg.norm(old_profile)

    k = kernel.reshape(kh, kw, cin, num_anchors, c).copy()
    for j in range(num_past_class, c):
        nj = np.linalg.norm(vecs[j])
        if nj > 1e-12 and old_norm > 1e-12:
            k[..., j] *= old_norm / nj
    node["output"]["kernel"] = jnp.asarray(k.reshape(kh, kw, cin, total))
    return out
