"""3+ state scenarios (the reference's headline shape is 15+1+1+1+1).

Review r2 regression: BiC's jitted step bakes the trained slot index +
logits width and A-GEM bakes the replay loader + mask shapes, so the
state-1 objects crash (or silently train the wrong bias slot) at
state >= 2 — the trainer now rebuilds them at every transition, carrying
the learned BiC (alpha, beta) forward.
"""
import os

import numpy as np
import pytest

from cl_object_detection_tpu.config import (
    AGEMConfig,
    BiCConfig,
    DataConfig,
    DistillConfig,
    ILConfig,
    MASConfig,
    ModelConfig,
    PrototypeConfig,
    PseudoLabelConfig,
    ReplayConfig,
    ScheduleConfig,
    TrainConfig,
)
from cl_object_detection_tpu.train.loop import train_process
from cl_object_detection_tpu.train.trainer import ILTrainer
from cl_object_detection_tpu.utils.toydata import make_toy_dataset


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toy_3state"))
    make_toy_dataset(root, num_images=15, seed=11, split="train")
    return root


def test_three_state_full_battery(toy, tmp_path):
    """scenario 2+2+1: two incremental transitions with BiC + A-GEM +
    replay + distill + MAS + pseudo-labels all enabled."""
    cfg = TrainConfig(
        model=ModelConfig(depth=18, compute_dtype="float32"),
        data=DataConfig(batch_size=2, min_side=100, max_side=192, height=128,
                        width=192, max_boxes=8, num_workers=0, prefetch=0),
        schedule=ScheduleConfig(lr=1e-4, every_iter=1, new_state_epoch=1),
        il=ILConfig(
            scenario=("2", "2", "1"), end_state=2,
            distill=DistillConfig(enabled=True),
            replay=ReplayConfig(sample_num=2, sample_method="random"),
            mas=MASConfig(enabled=True, ratio=0.5),
            agem=AGEMConfig(enabled=True, refresh_every=4),
            bic=BiCConfig(enabled=True, ratio=0.4),
            pseudo=PseudoLabelConfig(enabled=True, score_thresh=0.2),
        ),
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        start_epoch=1, end_epoch=1, record=False,
    )
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"), workdir=str(tmp_path))
    a_after_1 = {}

    # run state by state so state-1's trained alpha can be captured
    orig_next = trainer.next_state

    def capture_next():
        a_after_1["alphas"] = np.asarray(trainer.bic.params.alphas).copy() \
            if trainer.bic is not None and trainer.cur_state == 1 else \
            a_after_1.get("alphas")
        orig_next()

    trainer.next_state = capture_next
    train_process(trainer)

    assert trainer.cur_state == 2
    assert trainer.num_classes == 5
    # BiC was rebuilt for state 2 (slot index 1) and the state-1 slot's
    # trained alpha carried over
    assert trainer.bic is not None and trainer.bic.cur_state == 2
    alphas = np.asarray(trainer.bic.params.alphas)
    if a_after_1.get("alphas") is not None:
        np.testing.assert_allclose(alphas[0], a_after_1["alphas"][0])
    # state-2 slot trained post-epoch (moved off init 1.0)
    assert alphas[1] != pytest.approx(1.0)
    # A-GEM rebuilt: replay grad exists with the EXPANDED classifier shape
    assert trainer.agem is not None and trainer.agem.replay_grad is not None
    k = trainer.agem.replay_grad["classification_head"]["output"]["kernel"]
    assert k.shape[-1] == 9 * 5


def test_prototype_loss_without_replay(toy, tmp_path):
    """prototype.loss with sample_num == 0: the prototyper must still
    re-init at next_state (review r2: it was gated on replay)."""
    cfg = TrainConfig(
        model=ModelConfig(depth=18, compute_dtype="float32"),
        data=DataConfig(batch_size=2, min_side=100, max_side=192, height=128,
                        width=192, max_boxes=8, num_workers=0, prefetch=0),
        schedule=ScheduleConfig(lr=1e-4, every_iter=1, new_state_epoch=1),
        il=ILConfig(
            scenario=("3", "2"), end_state=1,
            distill=DistillConfig(enabled=True),
            prototype=PrototypeConfig(loss=True, start_epoch=0),
        ),
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        start_epoch=1, end_epoch=1, record=False,
    )
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"), workdir=str(tmp_path))
    train_process(trainer)
    assert trainer.cur_state == 1
    assert trainer.prototype_features is not None
    # prototypes describe the PREVIOUS state's classes (3 of them)
    assert trainer.prototype_features.shape[0] == 3


def test_pseudo_labels_without_distill_or_mas(toy, tmp_path):
    """--persuado_label alone must still build the frozen teacher
    (review r2: _update_prev_model early-returned, model=None crash)."""
    cfg = TrainConfig(
        model=ModelConfig(depth=18, compute_dtype="float32"),
        data=DataConfig(batch_size=2, min_side=100, max_side=192, height=128,
                        width=192, max_boxes=8, num_workers=0, prefetch=0),
        schedule=ScheduleConfig(lr=1e-4, every_iter=1, new_state_epoch=1),
        il=ILConfig(
            scenario=("3", "2"), end_state=1,
            pseudo=PseudoLabelConfig(enabled=True, score_thresh=0.2),
        ),
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        start_epoch=1, end_epoch=1, record=False,
    )
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"), workdir=str(tmp_path))
    train_process(trainer)
    assert trainer.cur_state == 1
    assert trainer.teacher_model is not None
    assert trainer.dataset_train.pseudo_labels is not None


def test_scail_standardizes_expanded_classifier(toy, tmp_path):
    """--scail: at state entry the expanded new-class filters are rescaled
    so each new class's weight norm equals the old classes' ranked-mean
    profile norm (il/scail.py, completing reference IL_method/scail.py)."""
    from cl_object_detection_tpu.il.scail import ranked_mean
    from cl_object_detection_tpu.models.expand import classifier_class_vectors

    cfg = TrainConfig(
        model=ModelConfig(depth=18, compute_dtype="float32"),
        data=DataConfig(batch_size=2, min_side=100, max_side=192, height=128,
                        width=192, max_boxes=8, num_workers=0, prefetch=0),
        schedule=ScheduleConfig(lr=1e-4, every_iter=1, new_state_epoch=1),
        il=ILConfig(scenario=("3", "2"), end_state=1, scail=True,
                    init_method="mean"),
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        start_epoch=1, end_epoch=1, record=False,
    )
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"), workdir=str(tmp_path))
    # pre-seed the similarity sidecar: the untrained model's similarity
    # gate zeroes out (<0.05), which would make the "mean" warm start a
    # zero vector — and scail deliberately skips zero vectors
    trainer.ckpt.save_array_sidecar(
        0, "similarity",
        [np.array([[0.6, 0.3, 0.1], [0.2, 0.5, 0.3]], np.float32)],
    )

    captured = {}
    orig_next = trainer.next_state

    def capture_next():
        orig_next()
        captured["params"] = jax_tree_np(trainer.train_state.params)

    trainer.next_state = capture_next
    train_process(trainer)

    assert "params" in captured
    vecs = classifier_class_vectors(captured["params"])   # (5, D)
    old_norm = float(np.linalg.norm(ranked_mean(vecs[:3])))
    assert old_norm > 1e-8
    for j in (3, 4):
        np.testing.assert_allclose(np.linalg.norm(vecs[j]), old_norm,
                                   rtol=1e-5)


def jax_tree_np(tree):
    import jax

    return jax.tree.map(np.asarray, tree)
