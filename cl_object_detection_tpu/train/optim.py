"""Optimizer stack: two Adam param-groups, MultiStep LR, beta swapping,
gradient accumulation — the reference's torch optimizer semantics
(/root/reference/main.py:57-62, train/train.py:48-72, 133-150,
train/il_trainer.py:29-43) rebuilt on optax.

Structure:
  chain(clip_by_global_norm(0.1),         # train.py:54-55
        multi_transform(
          backbone: inject_hyperparams(adam),
          output:   inject_hyperparams(adam)))   # 2 groups, main.py:57-59

Gradient accumulation (every_iter, train.py:48,71) is NOT here: the train
step accumulates explicitly (train/state.py docstring — clip/warm-mask/
A-GEM act on the accumulated gradient) and calls ``tx.update`` once per
applied step, so an optax.MultiSteps wrap would accumulate a second time.

``inject_hyperparams`` turns learning_rate/b1 into optimizer-state leaves,
so the host can do MultiStepLR decay per epoch and the per-batch Adam-beta1
swap on replay batches (``change_beta``, train.py:133-150) without
recompiling.

Grad-clip exceptions (no_clip / classifier-warm-stage, train.py:53-55) and
the warm-classifier old-class grad zeroing (train.py:58-66) are handled in
the train step, not here, because they're per-state static decisions.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ScheduleConfig

CLS_OUTPUT_PATH = ("classification_head", "output")


def param_labels(params) -> Any:
    """'output' for the classification output conv, 'backbone' for the rest
    (reference WHITE_LIST_FOR_OPTIM=['classificationModel.output'],
    il_trainer.py:29)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        keys = tuple(getattr(p, "key", getattr(p, "name", None)) for p in path)
        for i in range(len(keys) - 1):
            if keys[i] == CLS_OUTPUT_PATH[0] and keys[i + 1] == CLS_OUTPUT_PATH[1]:
                return "output"
        return "backbone"

    labels = [label_of(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


def make_optimizer(cfg: ScheduleConfig, params, use_clip: bool = True):
    """Returns the gradient transformation. ``cfg.every_iter`` deliberately
    does NOT wrap optax.MultiSteps — the train step owns accumulation (see
    module docstring); wrapping here would accumulate twice."""
    def adam_group(lr):
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=cfg.beta1, b2=cfg.beta2
        )

    # classifier_lr_scale: our extension knob (the reference keeps one lr
    # for both groups, main.py:57-59); the 'output' group's lr is scaled
    # here AND by set_learning_rate so MultiStepLR decay preserves it
    groups = optax.multi_transform(
        {"backbone": adam_group(cfg.lr),
         "output": adam_group(cfg.lr * cfg.classifier_lr_scale)},
        param_labels(params),
    )
    parts = []
    if use_clip and cfg.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    parts.append(groups)
    return optax.chain(*parts)


def lr_at_epoch(cfg: ScheduleConfig, epoch: int) -> float:
    """MultiStepLR: decay by cfg.scheduler_decay at each milestone epoch
    (scheduler.step() runs AFTER each epoch, so epoch k uses the number of
    milestones strictly below k)."""
    lr = cfg.lr
    for m in cfg.scheduler_milestone:
        if epoch > m:
            lr *= cfg.scheduler_decay
    return lr


# ---------------------------------------------------------------------------
# Optimizer-state surgery (runtime hyperparameter updates)
# ---------------------------------------------------------------------------

def _map_hyperparams(opt_state, fn):
    """Apply fn(group_name, hyperparams_dict) over every inject_hyperparams
    state in the tree, returning a new opt_state.

    Structure-agnostic: walks NamedTuple optimizer states generically; a
    node with a ``hyperparams`` field is an InjectHyperparamsState; a dict
    under an ``inner_states`` field maps group name -> group state (optax's
    partition/multi_transform state)."""
    def rec(node, group):
        if hasattr(node, "_fields"):  # NamedTuple state
            if "hyperparams" in node._fields:
                return node._replace(hyperparams=fn(group, dict(node.hyperparams)))
            updates = {}
            for f in node._fields:
                child = getattr(node, f)
                if f == "inner_states" and isinstance(child, dict):
                    updates[f] = {k: rec(v, k) for k, v in child.items()}
                else:
                    updates[f] = rec(child, group)
            return node._replace(**updates)
        if isinstance(node, dict):
            return {k: rec(v, group) for k, v in node.items()}
        if isinstance(node, (tuple, list)):
            return type(node)(rec(v, group) for v in node)
        return node

    return rec(opt_state, None)


def set_learning_rate(opt_state, lr: float, classifier_scale: float = 1.0):
    """MultiStepLR step: set lr on both groups ('output' keeps its
    classifier_lr_scale multiple)."""
    def fn(group, hp):
        if "learning_rate" in hp:
            scale = classifier_scale if group == "output" else 1.0
            hp["learning_rate"] = jnp.asarray(lr * scale, jnp.float32)
        return hp

    return _map_hyperparams(opt_state, fn)


def set_beta1(opt_state, b1: float, where: str = "all"):
    """change_beta (train.py:133-150): swap Adam beta1 on replay batches.
    where: 'all' | 'output' | 'feature' ('feature' = backbone group)."""
    target = {"all": None, "output": "output", "feature": "backbone"}[where]

    def fn(group, hp):
        if "b1" in hp and (target is None or group == target):
            hp["b1"] = jnp.asarray(b1, jnp.float32)
        return hp

    return _map_hyperparams(opt_state, fn)


def get_hyperparams(opt_state):
    """Debug/introspection helper: {group: {name: value}}."""
    out = {}

    def fn(group, hp):
        out[group] = {k: float(v) for k, v in hp.items() if jnp.ndim(v) == 0}
        return hp

    _map_hyperparams(opt_state, fn)
    return out
