"""Memory-Aware Synapses importance estimation.

Re-implements /root/reference/IL_method/mas.py: importance Omega = mean over
the dataset of |d ||output||^2 / d theta|, where the output norm is
  sum(cls_prob^2) / (B * C)  +  mean_b( mean |reg[positives_b]| )
(mas.py:35-67), excluding BatchNorm params and the classification output
conv (mas.py:91-124). The penalty itself lives in il/losses.py
(:func:`mas_penalty`).

The reference runs a per-image Python loop with exception swallowing; here
one jitted grad pass per batch accumulates |grad| on device.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import positive_assignment


def _excluded(path) -> bool:
    # The reference filter is the NAME test `"bn" not in name` (mas.py:98),
    # which catches bn/bn1/bn2/bn3 but NOT the downsample BatchNorm (torch
    # names it `downsample.1`) — so downsample-BN affines carry importance
    # upstream. Mirror that: exclude only our `bn*`-named modules, keep
    # `downsample_bn` in (pinned by test_mas_trajectory_equivalence).
    keys = [str(getattr(p, "key", "")) for p in path]
    for i, k in enumerate(keys):
        # every FrozenBN stores its leaves under an inner "bn" container —
        # that key alone must not exclude the downsample BN's leaves
        if k.startswith("bn") and (i == 0 or keys[i - 1] != "downsample_bn"):
            return True
    for i in range(len(keys) - 1):
        if keys[i] == "classification_head" and keys[i + 1] == "output":
            return True
    return False


def importance_mask(params) -> Any:
    """1.0 for included leaves, 0.0 for excluded (bn / cls output)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.zeros_like(x) if _excluded(path) else jnp.ones_like(x),
        params,
    )


def make_importance_step(model):
    """Returns jitted fn(variables, anchors, images, boxes, labels) ->
    |grad| tree. Anchors are a traced argument (one trace per frame)."""

    def output_norm(params, batch_stats, anchors, images, boxes, labels):
        variables = {"params": params, "batch_stats": batch_stats}
        cls, reg = model.apply(variables, images, enable_act=True)
        cls = cls.astype(jnp.float32)
        reg = reg.astype(jnp.float32)
        B, _, C = cls.shape

        def per_image(reg_i, boxes_i, labels_i):
            pos, _ = positive_assignment(anchors, boxes_i, labels_i)
            n = jnp.sum(pos.astype(jnp.float32))
            mean_abs = jnp.sum(jnp.where(pos[:, None], jnp.abs(reg_i), 0.0)) / jnp.maximum(
                n * 4.0, 1.0
            )
            return jnp.where(n > 0, mean_abs, 0.0)

        reg_norm = jnp.mean(jax.vmap(per_image)(reg, boxes, labels))
        cls_norm = jnp.sum(cls * cls) / (B * C)
        return cls_norm + reg_norm

    @jax.jit
    def step(variables, anchors, images, boxes, labels):
        g = jax.grad(output_norm, argnums=0)(
            variables["params"], variables["batch_stats"], anchors,
            images, boxes, labels
        )
        return jax.tree.map(jnp.abs, g)

    return step


def compute_importance(model, variables, anchors, loader, mesh=None) -> Any:
    """Full-dataset pass (mas.py:91-130): mean |grad| per param, zeroed on
    excluded leaves. Returns a tree like params.

    With ``mesh`` (single-process), batches shard over the ``data`` axis:
    the |grad| accumulation is a batch reduction, so GSPMD psums it across
    chips and the importance tree comes back replicated."""
    from ..ops.anchors import as_anchor_provider
    from ..parallel.mesh import tool_placers

    put, rep = tool_placers(mesh)
    variables = rep(variables)
    provider = as_anchor_provider(anchors)
    step = make_importance_step(model)
    acc = jax.tree.map(jnp.zeros_like, variables["params"])
    n = 0
    for batch in loader:
        g = step(variables, rep(jnp.asarray(provider(batch.images))),
                 put(batch.images), put(batch.boxes),
                 put(batch.labels))
        acc = jax.tree.map(jnp.add, acc, g)
        n += 1
    if n:
        acc = jax.tree.map(lambda a: a / n, acc)
    mask = importance_mask(variables["params"])
    return jax.tree.map(jnp.multiply, acc, mask)
