"""A-GEM: averaged replay gradient + projection.

Re-implements /root/reference/IL_method/agem.py: a full pass over the
replay loader computes an average gradient of the plain (replay-path) loss
— each batch's gradient is clipped to global-norm 0.1 first (agem.py:30),
BatchNorm params are excluded (agem.py:76) — and at every optimizer step
the current gradient is projected to not conflict with it
(train/step.py:_agem_project).

Cost note (SURVEY.md §7 hard-part 4): the reference recomputes the replay
gradient EVERY training iteration (train.py:233-234). ``refresh_every``
in AGEMConfig reproduces that at 1 and offers the documented fast path at
larger values — the trajectory changes and must be flagged in reports.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import FocalConfig, ILConfig
from .losses import LossStatics, compute_losses


def bn_mask(params) -> Any:
    """0 for BatchNorm leaves, 1 elsewhere — via the reference's NAME test
    `"bn" not in name` (agem.py:76,122-128), which catches bn/bn1/bn2/bn3
    but NOT the downsample BatchNorm (torch names it `downsample.1`), so
    downsample-BN affines stay in the replay-gradient vector upstream and
    here (our `downsample_bn` modules are kept in)."""
    def is_bn(path):
        keys = [str(getattr(p, "key", "")) for p in path]
        # every FrozenBN stores its leaves under an inner "bn" container —
        # that key alone must not exclude the downsample BN's leaves
        return any(k.startswith("bn")
                   and (i == 0 or keys[i - 1] != "downsample_bn")
                   for i, k in enumerate(keys))

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.zeros_like(x) if is_bn(path) else jnp.ones_like(x),
        params,
    )


class AGem:
    """Holds the replay loader + the current averaged replay gradient."""

    def __init__(self, model, anchors, il_cfg: ILConfig, focal_cfg: FocalConfig,
                 loss_statics: LossStatics, replay_loader, mesh=None):
        self.replay_loader = replay_loader
        self.replay_grad: Optional[Any] = None
        self._mask = None
        self.mesh = mesh               # shard replay batches over 'data'

        apply_plain = lambda v, x, act: model.apply(v, x, enable_act=act)

        def loss_fn(params, batch_stats, images, boxes, labels, anchors_):
            variables = {"params": params, "batch_stats": batch_stats}
            total, _ = compute_losses(
                apply_plain, None, variables, images, boxes, labels, anchors_,
                il_cfg, focal_cfg, loss_statics,
            )
            return total

        from ..ops.anchors import as_anchor_provider

        self._anchors_provider = as_anchor_provider(anchors)

        @jax.jit
        def grad_step(variables, anchors_, images, boxes, labels):
            g = jax.grad(loss_fn)(
                variables["params"], variables["batch_stats"], images, boxes,
                labels, anchors_,
            )
            # per-batch clip 0.1 (agem.py:30)
            norm = jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(g)))
            scale = jnp.minimum(1.0, 0.1 / jnp.maximum(norm, 1e-6))
            return jax.tree.map(lambda x: x * scale, g)

        self._grad_step = grad_step

    def compute_replay_grad(self, variables) -> Any:
        """Average gradient over the replay loader, bn leaves zeroed."""
        if self._mask is None:
            self._mask = bn_mask(variables["params"])
        acc = None
        n = max(len(self.replay_loader), 1)
        for batch in self.replay_loader:
            from ..parallel.mesh import put_step_batch

            images, boxes, labels = put_step_batch(self.mesh, batch)
            g = self._grad_step(
                variables, jnp.asarray(self._anchors_provider(batch.images)),
                images, boxes, labels,
            )
            g = jax.tree.map(lambda x, m: x * m / n, g, self._mask)
            acc = g if acc is None else jax.tree.map(jnp.add, acc, g)
        self.replay_grad = acc
        return acc
