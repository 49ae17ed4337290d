"""Similarity-based classifier warm-start.

Re-implements /root/reference/IL_method/weight_init.py: over the new
state's training images, for anchors that (IoU >= 0.5 with a new-class GT)
AND (sum of old-class probabilities >= 0.5), accumulate the old model's
normalized class distribution per new class; average per image then across
images; zero entries < 0.05; normalize by the GLOBAL sum
(weight_init.py:26-72). The (n_new x n_old) matrix feeds classifier
expansion (models/expand.py, methods 'mean'/'large').

The per-anchor accumulation is one jitted batched function instead of the
reference's per-image loop.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import positive_assignment


def make_similarity_step(model, num_new: int, num_old: int,
                         threshold: float = 0.5):
    """Jitted: batch -> (per-new-class summed distributions (n_new, n_old),
    per-new-class image-presence counts (n_new,)). Anchors are a traced
    argument (per-frame grids)."""

    @jax.jit
    def step(variables, anchors, images, boxes, labels):
        cls, _ = model.apply(variables, images, enable_act=True)
        cls = jnp.clip(cls.astype(jnp.float32), 1e-4, 1 - 1e-4)

        def per_image(p, boxes_i, labels_i):
            pos, assigned = positive_assignment(anchors, boxes_i, labels_i)
            old_sum = jnp.sum(p, axis=1)            # model has only old classes
            sel = pos & (old_sum >= threshold)

            # normalized old-class distribution per selected anchor
            dist = p / jnp.maximum(old_sum[:, None], 1e-8)
            # labels here are FINAL-state contiguous; new classes occupy
            # [num_old, num_old+num_new)
            a_label = assigned - num_old
            onehot = jax.nn.one_hot(
                jnp.clip(a_label, 0, num_new - 1), num_new, dtype=jnp.float32
            )
            onehot = onehot * sel[:, None] * (a_label >= 0)[:, None] * (a_label < num_new)[:, None]
            sums = onehot.T @ dist                   # (n_new, n_old)
            counts = jnp.sum(onehot, axis=0)         # anchors per new class
            # per-image mean over that class's anchors (weight_init.py:57-58)
            mean = sums / jnp.maximum(counts[:, None], 1.0)
            appear = (counts > 0).astype(jnp.float32)
            return mean * appear[:, None], appear

        means, appears = jax.vmap(per_image)(cls, boxes, labels)
        return jnp.sum(means, axis=0), jnp.sum(appears, axis=0)

    return step


def compute_similarity(model, variables, anchors, loader,
                       num_new: int, num_old: int, mesh=None) -> np.ndarray:
    """Full-dataset similarity matrix (weight_init.py:26-72).

    With ``mesh`` (single-process), batches shard over ``data``; the
    per-class sums/counts are batch reductions, psum'ed by GSPMD."""
    from ..ops.anchors import as_anchor_provider
    from ..parallel.mesh import tool_placers

    put, rep = tool_placers(mesh)
    variables = rep(variables)
    provider = as_anchor_provider(anchors)
    step = make_similarity_step(model, num_new, num_old)
    total = np.zeros((num_new, num_old), np.float64)
    count = np.zeros((num_new,), np.float64)
    for batch in loader:
        s, c = step(variables, rep(jnp.asarray(provider(batch.images))),
                    put(batch.images),
                    put(batch.boxes), put(batch.labels))
        total += np.asarray(s)
        count += np.asarray(c)
    sim = total / np.clip(count[:, None], 1.0, None)
    sim = np.where(sim > 0.05, sim, 0.0)
    denom = sim.sum()
    if denom > 0:
        sim = sim / denom
    return sim.astype(np.float32)
