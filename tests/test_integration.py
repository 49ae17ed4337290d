"""End-to-end smoke: toy dataset -> joint + incremental training -> eval.

Exercises the full slice: config -> datasets -> trainer -> loop ->
checkpoints -> batched predict -> COCO-protocol eval, plus the
incremental transition with distillation + replay + classifier expansion.
"""
import os

import jax
import numpy as np
import pytest

from cl_object_detection_tpu.config import (
    DataConfig,
    ILConfig,
    DistillConfig,
    ModelConfig,
    PredictConfig,
    ReplayConfig,
    ScheduleConfig,
    TrainConfig,
)
from cl_object_detection_tpu.data.coco import CocoJson
from cl_object_detection_tpu.eval.evaluator import Evaluator
from cl_object_detection_tpu.train.loop import train_process
from cl_object_detection_tpu.train.trainer import ILTrainer
from cl_object_detection_tpu.utils.toydata import DEFAULT_CLASSES, make_toy_dataset


def tiny_cfg(tmp, scenario, end_state=None, **il_kw):
    return TrainConfig(
        model=ModelConfig(depth=18, compute_dtype="float32"),
        data=DataConfig(
            batch_size=2, min_side=100, max_side=192, height=128, width=192,
            max_boxes=8, num_workers=0, prefetch=0,
        ),
        schedule=ScheduleConfig(lr=1e-4, every_iter=1, new_state_epoch=1),
        il=ILConfig(scenario=tuple(scenario), end_state=end_state, **il_kw),
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        start_epoch=1,
        end_epoch=1,
        record=False,
    )


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toy_e2e"))
    make_toy_dataset(root, num_images=14, seed=1, split="train")
    return root


def test_joint_training_and_eval(toy, tmp_path):
    cfg = tiny_cfg(str(tmp_path), ["5"])
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"), workdir=str(tmp_path))
    train_process(trainer)

    # checkpoint written
    assert trainer.ckpt.latest_epoch(0) == 1

    # eval runs end-to-end (AP will be junk after 1 epoch; just plumbing)
    ev = Evaluator(
        trainer.coco, trainer.states, os.path.join(toy, "images"),
        cfg.data, PredictConfig(max_detections=50), state_index=0,
        eval_on_train=True,
    )
    result = ev.run(trainer.model, trainer.variables(),
                    result_dir=str(tmp_path / "val"))
    assert set(result.ap50) == set(DEFAULT_CLASSES)
    assert os.path.exists(tmp_path / "val" / "voc2007_results_epoch0.json")


def test_incremental_with_distill_and_replay(toy, tmp_path):
    cfg = tiny_cfg(
        str(tmp_path), ["3", "2"], end_state=1,
        distill=DistillConfig(enabled=True),
        replay=ReplayConfig(sample_num=1, sample_method="random"),
    )
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"), workdir=str(tmp_path))
    assert trainer.num_classes == 3
    train_process(trainer)

    # after next_state: expanded classifier, teacher loaded, state-1 ckpt
    assert trainer.cur_state == 1
    assert trainer.num_classes == 5
    assert trainer.teacher_variables is not None
    k = trainer.train_state.params["classification_head"]["output"]["kernel"]
    assert k.shape[-1] == 9 * 5
    assert trainer.ckpt.latest_epoch(1) == 1
    # replay memory recorded
    meta = trainer.ckpt.load_sidecar(1, "examplar")
    assert meta and len(meta) >= 1
    # examplar.txt + montage PNG (il_trainer.py:230-257)
    state_dir = trainer.ckpt.state_dir(1)
    with open(os.path.join(state_dir, "examplar.txt")) as f:
        ids = [int(line) for line in f if line.strip()]
    assert ids == list(meta)
    assert os.path.exists(os.path.join(state_dir, "examplar.png"))


def test_incremental_multimethod_sweep(toy, tmp_path):
    """BASELINE config 5: MAS + BiC + replay + A-GEM + pseudo-labels."""
    from cl_object_detection_tpu.config import (
        AGEMConfig,
        BiCConfig,
        MASConfig,
        PseudoLabelConfig,
    )

    cfg = tiny_cfg(
        str(tmp_path), ["3", "2"], end_state=1,
        distill=DistillConfig(enabled=True),
        # sample_num=2 + ratio 0.4 -> BiC carves 1 exemplar per class and
        # leaves 1 (sample_num=1 would let BiC consume the whole replay
        # memory — true of the reference's carve logic too, bic.py:98-132)
        replay=ReplayConfig(sample_num=2, sample_method="random"),
        mas=MASConfig(enabled=True, ratio=0.5),
        agem=AGEMConfig(enabled=True, refresh_every=4),
        bic=BiCConfig(enabled=True, ratio=0.4),
        pseudo=PseudoLabelConfig(enabled=True, score_thresh=0.2),
    )
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"), workdir=str(tmp_path))
    train_process(trainer)

    assert trainer.cur_state == 1
    assert trainer.num_classes == 5
    # every tool came up
    assert trainer.mas_importance is not None
    assert trainer.agem is not None and trainer.agem.replay_grad is not None
    assert trainer.bic is not None
    # bic alphas for state 1 moved off their init (trained post-epoch)
    alphas = np.asarray(trainer.bic.params.alphas)
    assert alphas.shape[0] == 1
    # checkpoint meta carries bic params
    _, meta = trainer.ckpt.restore(1, -1)
    assert "bic" in meta
    # mas importance sidecar cached
    assert trainer.ckpt.load_array_sidecar(0, "mas_importance") is not None

    # --- BiC correction is APPLIED at inference (reference model.py:504-505,
    # evaluator.py:305-308): corrected predictions differ from uncorrected,
    # and the decline CSV built from them differs too.
    from cl_object_detection_tpu.eval.report import decline_csv
    from cl_object_detection_tpu.il.bic import bic_correct_from_meta

    ev = Evaluator(
        trainer.coco, trainer.states, os.path.join(toy, "images"),
        cfg.data, PredictConfig(max_detections=50, score_thresh=1e-4),
        state_index=1, eval_on_train=True,
    )
    counts = [s.num_new_class for s in trainer.states.states]

    # the TRAINED (alpha, beta) from the checkpoint meta changes scores
    bc = bic_correct_from_meta(meta, counts, trainer.num_classes)
    assert bc is not None
    rows_plain = ev.predict_dataset(trainer.model, trainer.variables())
    rows_bic = ev.predict_dataset(trainer.model, trainer.variables(),
                                  bic_correct=bc)
    new_ids = set(trainer.states[1].new_ids)
    s_plain = sorted(r["score"] for r in rows_plain
                     if r["category_id"] in new_ids)
    s_bic = sorted(r["score"] for r in rows_bic
                   if r["category_id"] in new_ids)
    assert s_plain and s_bic and s_plain != s_bic

    # an amplified correction visibly moves the decline CSV
    bc_amp = bic_correct_from_meta(
        {"bic": {"alphas": [3.0], "betas": [4.0]}}, counts,
        trainer.num_classes)
    rows_amp = ev.predict_dataset(trainer.model, trainer.variables(),
                                  bic_correct=bc_amp)
    res_plain = ev.evaluate(rows_plain)
    res_amp = ev.evaluate(rows_amp)
    names = trainer.states[1].knowing_names
    csv_plain = decline_csv({1: res_plain}, names, 3)
    csv_amp = decline_csv({1: res_amp}, names, 3)
    assert csv_plain != csv_amp


def test_incremental_prototype_and_classifier_loss(toy, tmp_path):
    """Prototype anchoring + prototype-herd sampling + classifier-sim loss."""
    from cl_object_detection_tpu.config import PrototypeConfig

    cfg = tiny_cfg(
        str(tmp_path), ["3", "2"], end_state=1,
        distill=DistillConfig(enabled=True),
        replay=ReplayConfig(sample_num=1, sample_method="prototype_herd"),
        prototype=PrototypeConfig(loss=True, start_epoch=0, margin=50.0),
        classifier_loss=True,
    )
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"), workdir=str(tmp_path))
    train_process(trainer)
    assert trainer.cur_state == 1
    assert trainer.prototype_features is not None
    assert trainer.prototype_features.shape[0] == 3   # prev-state classes
    assert trainer._teacher_class_vectors is not None
    # run one more batch and check the loss keys appear
    batch = next(iter(trainer.train_loader))
    trainer.cur_epoch = 1
    m = trainer.run_batch(batch)
    assert "prototype_loss" in m and np.isfinite(m["prototype_loss"])
    assert "sim_loss" in m and np.isfinite(m["sim_loss"])


def test_crash_resume_is_bitwise(toy, tmp_path):
    """Kill-and-resume reproduces the uninterrupted run EXACTLY: run A
    trains epochs 1..4 straight through; run B trains 1..2, 'crashes',
    and a fresh trainer resumes (params + optimizer state via the
    checkpoint, data order via the epoch-pinned loader RNG) for 3..4.
    Final parameter trees must match bitwise (SURVEY.md §5 failure
    recovery; the loader's scheduling-independent augmentation hash)."""
    # run A: uninterrupted
    cfgA = tiny_cfg(str(tmp_path / "a"), ["5"]).replace(end_epoch=4)
    trA = ILTrainer(cfgA, os.path.join(toy, "train.json"),
                    os.path.join(toy, "images"), workdir=str(tmp_path / "a"))
    train_process(trA)
    paramsA = jax.tree.map(np.asarray, trA.train_state.params)

    # run B part 1: epochs 1..2 then "crash" (only epoch 2 on disk)
    cfgB = tiny_cfg(str(tmp_path / "b"), ["5"]).replace(end_epoch=2)
    trB = ILTrainer(cfgB, os.path.join(toy, "train.json"),
                    os.path.join(toy, "images"), workdir=str(tmp_path / "b"))
    train_process(trB)
    loss_hist_b1 = [float(x) for x in trB.loss_hist]
    del trB

    # run B part 2: fresh process state, resume at epoch 3
    cfgB2 = tiny_cfg(str(tmp_path / "b"), ["5"]).replace(
        start_epoch=3, end_epoch=4)
    trB2 = ILTrainer(cfgB2, os.path.join(toy, "train.json"),
                     os.path.join(toy, "images"), workdir=str(tmp_path / "b"))
    trB2.resume(0, 2)                 # optimizer state too (cli.train path)
    # the running-loss window rides in the checkpoint and is restored on
    # resume (reference params.py:307-322 + main.py:71): right after
    # resume it holds exactly run-B-part-1's per-iteration losses
    assert list(trB2.loss_hist) == loss_hist_b1
    _, metaB = trB2.ckpt.restore(0, 2)
    assert metaB["loss_hist"] == list(trB2.loss_hist)
    assert metaB["epoch_loss"] and all(
        np.isfinite(x) for x in metaB["epoch_loss"])
    train_process(trB2)
    paramsB = jax.tree.map(np.asarray, trB2.train_state.params)

    for a, b in zip(jax.tree.leaves(paramsA), jax.tree.leaves(paramsB)):
        np.testing.assert_array_equal(a, b)
    # uninterrupted vs resumed runs accumulate the SAME loss history
    np.testing.assert_allclose(np.asarray(trA.loss_hist),
                               np.asarray(trB2.loss_hist), rtol=1e-6)


def test_cross_state_resume(toy, tmp_path):
    """Launching at --start_state 1 --start_epoch 1 loads state-0's newest
    checkpoint and expands it (reference main.py:46-49, 82)."""
    cfg0 = tiny_cfg(str(tmp_path), ["3", "2"], end_state=0)
    tr0 = ILTrainer(cfg0, os.path.join(toy, "train.json"),
                    os.path.join(toy, "images"), workdir=str(tmp_path))
    train_process(tr0)
    k0 = np.asarray(
        tr0.train_state.params["classification_head"]["output"]["kernel"]
    ).reshape(3, 3, 256, 9, 3)

    cfg1 = tiny_cfg(
        str(tmp_path), ["3", "2"], end_state=1, start_state=1,
        distill=DistillConfig(enabled=True),
    )
    tr1 = ILTrainer(cfg1, os.path.join(toy, "train.json"),
                    os.path.join(toy, "images"), workdir=str(tmp_path))
    assert tr1.num_classes == 5
    k1 = np.asarray(
        tr1.train_state.params["classification_head"]["output"]["kernel"]
    ).reshape(3, 3, 256, 9, 5)
    # old-class filters preserved from the state-0 checkpoint
    np.testing.assert_allclose(k1[..., :3], k0, rtol=1e-6)
    # teacher is loaded and matches the state-0 checkpoint too
    kt = np.asarray(
        tr1.teacher_variables["params"]["classification_head"]["output"]["kernel"]
    ).reshape(3, 3, 256, 9, 3)
    np.testing.assert_allclose(kt, k0, rtol=1e-6)
    # backbone weights also came from the checkpoint, not random re-init
    b0 = np.asarray(tr0.train_state.params["backbone"]["conv1"]["kernel"])
    b1 = np.asarray(tr1.train_state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(b1, b0, rtol=1e-6)
