"""The jit-compiled train step.

One fused XLA program per (state, batch-kind, warm-stage) combination:
forward + IL loss composition + backward + gradient accumulation + (at
every ``every_iter``-th micro-step) clip -> warm-classifier masking ->
A-GEM projection -> Adam, reproducing the reference's iteration semantics
(/root/reference/train/train.py:15-80) without any host round-trips.

Data parallelism: run under a Mesh with the batch sharded on the 'data'
axis and params replicated — GSPMD inserts the gradient all-reduce.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import FocalConfig, ILConfig, ScheduleConfig
from ..il.losses import LossStatics, compute_losses
from .state import TrainState


@dataclass(frozen=True)
class StepStatics:
    """Static switches that pick the compiled variant."""
    every_iter: int = 2
    use_clip: bool = True              # ¬no_clip ∧ ¬warm-classifier (train.py:53-55)
    grad_clip: float = 0.1
    warm_classifier: bool = False      # zero old-class output grads (train.py:58-66)
    num_past_class: int = 0
    num_knowing_class: int = 0
    num_anchors: int = 9
    use_agem: bool = False


def _zero_old_class_grads(grads, s: StepStatics):
    """train.py:58-66: during the classifier warm stage, old-class rows of
    the classification output conv get zero gradient (per anchor slot)."""
    out = grads["classification_head"]["output"]
    kernel, bias = out["kernel"], out["bias"]
    kh, kw, cin, total = kernel.shape
    c = s.num_knowing_class
    k = kernel.reshape(kh, kw, cin, s.num_anchors, c)
    b = bias.reshape(s.num_anchors, c)
    mask = (jnp.arange(c) >= s.num_past_class).astype(kernel.dtype)
    k = k * mask
    b = b * mask
    grads = dict(grads)
    grads["classification_head"] = dict(grads["classification_head"])
    grads["classification_head"]["output"] = {
        "kernel": k.reshape(kh, kw, cin, total),
        "bias": b.reshape(total),
    }
    return grads


def _clip_by_global_norm(grads, max_norm: float):
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)


def _agem_project(grads, replay_grad):
    """A-GEM (agem.py:122-143): if <g, g_r> < 0, project g onto the
    half-space: g <- g - (<g,g_r>/||g_r||^2) g_r."""
    dot = sum(
        jnp.sum(a * b)
        for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(replay_grad))
    )
    rr = sum(jnp.sum(b * b) for b in jax.tree.leaves(replay_grad))
    coef = jnp.where(dot < 0, dot / jnp.maximum(rr, 1e-12), 0.0)
    return jax.tree.map(lambda g, r: g - coef * r, grads, replay_grad)


def make_train_step(
    model,
    teacher_model,
    anchors,
    il_cfg: ILConfig,
    focal_cfg: FocalConfig,
    loss_statics: LossStatics,
    step_statics: StepStatics,
    donate: bool = True,
    param_constraint: Optional[Callable] = None,
):
    """Build the jitted step.

    Returns fn(state, images, boxes, labels, *, teacher_variables=None,
    replay_grad=None, pseudo_progress=None, mas_prev_params=None,
    mas_importance=None, ...) -> (state, metrics). BiC correction is NOT
    a step argument (a Python closure is not a jittable input) —
    il/bic.py jits its own bias-training loss around compute_losses.
    """
    apply_plain = lambda v, x, act: model.apply(v, x, enable_act=act)
    apply_feats = lambda v, x, act: model.apply(
        v, x, enable_act=act, method="forward_all"
    )
    apply_proto = lambda v, x: model.apply(
        v, x, enable_act=False, method="classification_features"
    )
    if teacher_model is not None:
        t_apply_feats = lambda v, x, act: teacher_model.apply(
            v, x, enable_act=act, method="forward_all"
        )
    else:
        t_apply_feats = None

    ss = step_statics

    def step_fn(
        state: TrainState,
        images,
        boxes,
        labels,
        teacher_variables=None,
        replay_grad=None,
        pseudo_progress=None,
        mas_prev_params=None,
        mas_importance=None,
        trainable_mask=None,
        prototype_features=None,
        classifier_vectors=None,
    ):
        proto_extras = None
        if loss_statics.use_prototype and prototype_features is not None:
            proto_extras = {
                "apply": apply_proto,
                "old_prototypes": prototype_features,
                "margin": il_cfg.prototype.margin,
                "weight": il_cfg.prototype.weight,
            }

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            total, metrics = compute_losses(
                apply_plain,
                apply_feats,
                variables,
                images,
                boxes,
                labels,
                anchors,
                il_cfg,
                focal_cfg,
                loss_statics,
                teacher_apply_with_feats=t_apply_feats,
                teacher_variables=teacher_variables,
                pseudo_progress=pseudo_progress,
                mas_prev_params=mas_prev_params,
                mas_importance=mas_importance,
                prototype_extras=proto_extras,
                classifier_vectors=classifier_vectors,
            )
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        def transform_and_apply(g, opt_state, params):
            if trainable_mask is not None:
                # warm-up freezing (il_trainer.py:337-349): frozen params
                # get no gradient; mask BEFORE clip so the norm matches
                # torch's requires_grad=False behavior
                g = jax.tree.map(jnp.multiply, g, trainable_mask)
            if ss.use_clip and ss.grad_clip > 0:
                g = _clip_by_global_norm(g, ss.grad_clip)
            if ss.warm_classifier:
                g = _zero_old_class_grads(g, ss)
            if ss.use_agem and replay_grad is not None:
                g = _agem_project(g, replay_grad)
            updates, new_opt = state.tx.update(g, opt_state, params)
            new_params = jax.tree.map(jnp.add, params, updates)
            if param_constraint is not None:
                # ZeRO-1 (parallel.mesh.make_param_constraint): the update
                # was computed on data-sharded Adam moments — pin the new
                # params back to their canonical (replicated/TP) sharding
                # here so GSPMD places the all-gather in the optimizer
                # phase, not in the next forward
                new_params = param_constraint(new_params)
            return new_params, new_opt

        if ss.every_iter <= 1:
            if loss_statics.enhance_only:
                # final correction skips the optimizer entirely on a clean
                # batch (correction_new_class: `if loss == 0: return True`)
                # — Adam's carried moments would otherwise still move
                # params on a zero gradient
                def corr_apply(operand):
                    opt_state, params = operand
                    return transform_and_apply(grads, opt_state, params)[::-1]

                new_opt, new_params = jax.lax.cond(
                    total > 0,
                    corr_apply,
                    lambda op: (op[0], op[1]),
                    (state.opt_state, state.params),
                )
                return state.replace(
                    step=state.step + 1, params=new_params, opt_state=new_opt,
                ), metrics
            # static fast path: no accumulator traffic, no cond
            new_params, new_opt = transform_and_apply(
                grads, state.opt_state, state.params
            )
            new_state = state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt,
            )
            return new_state, metrics

        acc = jax.tree.map(jnp.add, state.grad_acc, grads)
        count = state.acc_count + 1
        do_apply = count >= ss.every_iter

        def apply_branch(operand):
            acc, opt_state, params = operand
            g = jax.tree.map(lambda a: a / ss.every_iter, acc)
            new_params, new_opt = transform_and_apply(g, opt_state, params)
            zero = jax.tree.map(jnp.zeros_like, acc)
            return zero, new_opt, new_params

        def skip_branch(operand):
            return operand

        new_acc, new_opt, new_params = jax.lax.cond(
            do_apply, apply_branch, skip_branch, (acc, state.opt_state, state.params)
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            grad_acc=new_acc,
            acc_count=jnp.where(do_apply, 0, count),
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
