"""BiC: bias-correction layers for class-incremental logits.

Re-implements /root/reference/IL_method/bic.py. Each incremental state k>=1
gets a scalar affine (alpha_k, beta_k) applied to THAT state's new-class
logit slice (bic.py:12-20, 40-56, 168-184); state-0 classes pass through.
Instead of per-state tensor splits + concat, the correction materializes a
per-class (scale, offset) vector — one fused multiply-add, differentiable
in (alphas, betas).

Training (bic.py:186-227): after each epoch, the detector is frozen and
only the CURRENT state's (alpha, beta) trains with Adam lr=1e-3 over a
held-out loader, using the plain replay-path loss (is_replay=True,
is_bic=True). The held-out set carves per_num = max(sample_num*ratio, 1)
images per class out of the replay and train streams (bic.py:98-132).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import BiCConfig, FocalConfig, ILConfig
from .losses import LossStatics, compute_losses


class BicParams:
    """alphas/betas per incremental state (num_states-1 scalars each)."""

    def __init__(self, num_states: int):
        self.alphas = jnp.ones((max(num_states - 1, 1),), jnp.float32)
        self.betas = jnp.zeros((max(num_states - 1, 1),), jnp.float32)

    def tree(self) -> Dict[str, jnp.ndarray]:
        return {"alphas": self.alphas, "betas": self.betas}

    def load(self, tree: Dict[str, Any]) -> None:
        self.alphas = jnp.asarray(tree["alphas"], jnp.float32)
        self.betas = jnp.asarray(tree["betas"], jnp.float32)


def class_state_index(new_class_counts: Sequence[int]) -> np.ndarray:
    """Per contiguous-label state index: [0]*n0 + [1]*n1 + ... ."""
    out = []
    for s, n in enumerate(new_class_counts):
        out.extend([s] * n)
    return np.asarray(out, np.int32)


def make_bic_correct(new_class_counts: Sequence[int], num_knowing: int):
    """Returns fn(logits (B,A,C), alphas, betas) -> corrected logits.

    Classes of state 0 are identity; state k>=1 classes get
    alpha_{k-1} * x + beta_{k-1} (bic.py:40-56).
    """
    state_of_class = class_state_index(new_class_counts)[:num_knowing]

    def correct(logits, alphas, betas):
        s = jnp.asarray(state_of_class)
        scale = jnp.where(s == 0, 1.0, alphas[jnp.maximum(s - 1, 0)])
        offset = jnp.where(s == 0, 0.0, betas[jnp.maximum(s - 1, 0)])
        return logits * scale[None, None, :] + offset[None, None, :]

    return correct


def bic_correct_from_meta(il_meta, new_class_counts: Sequence[int],
                          num_knowing: int):
    """Build the inference-time correction closure from a checkpoint's
    ``il_meta['bic']`` alphas/betas — the reference ``Bic_Evaluator``
    applied inside ``model.predict`` (model.py:504-505) and at eval
    (evaluator.py:305-308, 323-324; it loads a per-epoch ``bic_<e>.pt``,
    here the scalars ride in each checkpoint's meta). Returns None when
    the checkpoint carries no BiC state."""
    if not il_meta or "bic" not in il_meta:
        return None
    alphas = jnp.asarray(il_meta["bic"]["alphas"], jnp.float32)
    betas = jnp.asarray(il_meta["bic"]["betas"], jnp.float32)
    correct = make_bic_correct(new_class_counts, num_knowing)
    fn = lambda logits: correct(logits, alphas, betas)
    # expose the correction as per-class (scale, offset) vectors so
    # multi-epoch eval can pass them as RUNTIME args to one shared
    # compiled predict instead of baking a closure per epoch
    # (eval/evaluator.predict_dataset_multi)
    s = np.asarray(class_state_index(new_class_counts)[:num_knowing])
    al = np.asarray(il_meta["bic"]["alphas"], np.float32)
    be = np.asarray(il_meta["bic"]["betas"], np.float32)
    idx = np.maximum(s - 1, 0)
    fn.scale = np.where(s == 0, 1.0, al[idx]).astype(np.float32)
    fn.offset = np.where(s == 0, 0.0, be[idx]).astype(np.float32)
    return fn


class BicTrainer:
    """Post-epoch bias-layer training over the held-out loader."""

    def __init__(
        self,
        model,
        anchors,
        il_cfg: ILConfig,
        focal_cfg: FocalConfig,
        bic_cfg: BiCConfig,
        new_class_counts: Sequence[int],
        cur_state: int,
        num_past_class: int,
        bic_loader,
        mesh=None,
    ):
        self.cur_state = cur_state
        self.bic_loader = bic_loader
        self.mesh = mesh               # shard held-out batches over 'data'
        self.params = BicParams(len(new_class_counts))
        num_knowing = sum(new_class_counts[: cur_state + 1])
        correct = make_bic_correct(new_class_counts, num_knowing)
        self.correct = correct

        # only the current state's scalars train (bic.py:96, 158-167)
        idx = cur_state - 1
        self.opt = optax.adam(bic_cfg.lr)
        self.opt_state = self.opt.init(self.params.tree())

        apply_plain = lambda v, x, act: model.apply(v, x, enable_act=act)
        statics = LossStatics(
            num_classes=num_knowing, num_past_class=num_past_class,
            incremental=False, is_replay=True, is_bic=True,
        )
        from ..ops.anchors import as_anchor_provider

        self._anchors_provider = as_anchor_provider(anchors)

        def loss_fn(bic_tree, variables, anchors_, images, boxes, labels):
            bc = lambda logits: correct(logits, bic_tree["alphas"], bic_tree["betas"])
            total, metrics = compute_losses(
                apply_plain, None, variables, images, boxes, labels, anchors_,
                il_cfg, focal_cfg, statics, bic_correct=bc,
            )
            return total, metrics

        @jax.jit
        def train_step(bic_tree, opt_state, variables, anchors_, images,
                       boxes, labels):
            (total, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(
                bic_tree, variables, anchors_, images, boxes, labels
            )
            # mask: only the current state's slot updates
            mask = jnp.zeros_like(bic_tree["alphas"]).at[idx].set(1.0)
            g = {"alphas": g["alphas"] * mask, "betas": g["betas"] * mask}
            updates, opt_state = self.opt.update(g, opt_state, bic_tree)
            bic_tree = optax.apply_updates(bic_tree, updates)
            return bic_tree, opt_state, metrics

        self._train_step = train_step

    # ------------------------------------------------------------------
    def correction_fn(self):
        """Closure for inference/loss paths: logits -> corrected logits."""
        alphas, betas = self.params.alphas, self.params.betas
        return lambda logits: self.correct(logits, alphas, betas)

    def train_epoch(self, variables) -> float:
        """One pass over the held-out loader (bic.py:186-227)."""
        tree = self.params.tree()
        total = 0.0
        n = 0
        for batch in self.bic_loader:
            from ..parallel.mesh import put_step_batch

            images, boxes, labels = put_step_batch(self.mesh, batch)
            tree, self.opt_state, metrics = self._train_step(
                tree, self.opt_state, variables,
                jnp.asarray(self._anchors_provider(batch.images)),
                images, boxes, labels,
            )
            total += float(metrics["total_loss"])
            n += 1
        self.params.load(tree)
        return total / max(n, 1)

def carve_bic_val_set(
    train_image_ids: List[int],
    replay_image_ids: List[int],
    replay_seen_class_ids: Sequence[int],
    train_seen_class_ids: Sequence[int],
    new_class_ids: Sequence[int],
    coco,
    sample_num: int,
    ratio: float,
) -> Tuple[List[int], List[List[int]], List[int], List[int]]:
    """bic.py:98-132: carve per_num images per class out of BOTH streams.

    Returns (bic_image_ids, per_image_seen_class_lists,
             remaining_train_ids, remaining_replay_ids).
    """
    per_num = max(int(sample_num * ratio), 1)
    bic_ids: List[int] = []
    seen_lists: List[List[int]] = []
    train_ids = list(train_image_ids)
    replay_ids = list(replay_image_ids)

    # old data: per_num from each class block of the replay list
    for start in range(0, len(replay_ids) // max(sample_num, 1) * sample_num, max(sample_num, 1)):
        block = replay_image_ids[start : start + sample_num]
        for img_id in block[:per_num]:
            bic_ids.append(img_id)
            seen_lists.append(list(replay_seen_class_ids))
            replay_ids.remove(img_id)

    # new data: per_num per new class from the train stream
    remaining_new = list(train_ids)
    for cat_id in new_class_ids:
        cand = sorted(set(coco.get_imgs_by_cats(cat_id)) & set(remaining_new))
        for img_id in cand[:per_num]:
            bic_ids.append(img_id)
            seen_lists.append(list(train_seen_class_ids))
            train_ids.remove(img_id)
            remaining_new.remove(img_id)

    return bic_ids, seen_lists, train_ids, replay_ids
