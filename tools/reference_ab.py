#!/usr/bin/env python
"""Outcome-level cross-framework A/B: train the REFERENCE's own
``train_process`` (torch, CPU) and THIS framework on the identical toy
incremental problem, then evaluate both final models with the same
evaluator and report the mAP50 delta (BASELINE.md configs 4-5 stand-in:
"VOC2007 mAP delta <= 0.3 vs the PyTorch reference" is unmeasurable on
this rig — no VOC, no CUDA — so this is the strongest obtainable
outcome-level evidence).

Design (fidelity over convenience):
  * The reference side runs /root/reference/train/train.py's OWN
    ``train_process`` loop, ``training_iteration``, ``change_beta``,
    ``IL_Loss``, model (``create_retinanet``), optimizer groups
    (main.py:57-59) and ``model.next_state`` expansion (model.py:216-270)
    — only the DATA layer (pycocotools/skimage loaders, absent in this
    image) is replaced: both frameworks consume the EXACT same batch
    streams from this repo's BatchLoader (same pixels, same augmentation,
    same order, same -1 padding), wrapped into the reference's
    ``{'img': NCHW, 'annot': (B,M,5)}`` dict form. ``.cuda()`` and
    ``torch.cuda.device`` are routed to CPU (the reference hardcodes
    cuda:0; torch here is CPU-only).
  * Both sides: scenario 3+2 on a 5-class separable toy set, R18 from
    scratch, distill (features/cls/reg, probability form) + tail replay
    (random exemplars — identical ids by seed) + enhance_error + the
    Adam beta1 swap + clip 0.1. No MAS/BiC/A-GEM/pseudo/prototype/warm
    (each is covered by its own parity test; this measures the composed
    core IL dynamics end to end).
  * Evaluation: OUR evaluator + COCO-protocol AP on the toy test split
    for both models (the reference .pt loads via models/convert —
    predict-path parity is pinned separately in
    tests/test_reference_parity.py), so the comparison isolates the
    TRAINING dynamics.

Writes measurements JSON + prints a summary table.

    python tools/reference_ab.py --out /tmp/ref_ab [--epochs0 16 --epochs1 12]
"""
from __future__ import annotations

import argparse
import contextlib
import copy
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"

N_OLD, N_NEW = 3, 2
CLASSES = [f"cls{i}" for i in range(N_OLD + N_NEW)]


# ---------------------------------------------------------------------------
# reference import with data-layer stubs (tests/test_reference_parity.py
# pattern: stub ONLY what's missing in this image)
# ---------------------------------------------------------------------------

def _stub_missing_modules():
    def tv_nms(boxes, scores, iou):  # functional CPU NMS for persuado_label
        import torch

        keep = []
        idxs = scores.argsort(descending=True)
        while idxs.numel():
            i = idxs[0]
            keep.append(int(i))
            if idxs.numel() == 1:
                break
            rest = idxs[1:]
            x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            a = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (
                boxes[:, 3] - boxes[:, 1]).clamp(min=0)
            iou_v = inter / (a[i] + a[rest] - inter).clamp(min=1e-9)
            idxs = rest[iou_v <= iou]
        return torch.tensor(keep, dtype=torch.long)

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = tv_nms
        ops.batched_nms = None
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    tv = sys.modules["torchvision"]
    if not hasattr(tv, "transforms"):
        tr = types.ModuleType("torchvision.transforms")
        tr.Compose = lambda *a, **k: None
        tv.transforms = tr
        sys.modules["torchvision.transforms"] = tr
    for name, attrs in [
        ("pycocotools", {}), ("pycocotools.coco", {"COCO": object}),
        ("pycocotools.cocoeval", {"COCOeval": object}),
        ("skimage", {}), ("skimage.io", {}), ("skimage.transform", {}),
        ("skimage.color", {}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m


def _import_reference():
    _stub_missing_modules()
    sys.path.insert(0, REF)
    from retinanet import model as ref_model  # noqa: F401
    from train import train as ref_train  # noqa: F401
    sys.path.remove(REF)
    return ref_model, ref_train


def _patch_cpu():
    """Route the reference's hardcoded cuda calls to CPU (parity-suite
    pattern, ref_cpu fixture)."""
    import torch

    real_device = torch.device
    torch.device = lambda *a, **k: real_device("cpu")
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.device = lambda *a, **k: contextlib.nullcontext()


# ---------------------------------------------------------------------------
# the data bridge: our BatchLoader -> the reference's dataloader duck type
# ---------------------------------------------------------------------------

class EpochLoader:
    """train_process iterates ``dataloader_train`` exactly once per epoch;
    this wrapper advances our loader's epoch on each pass so the batch
    stream matches phase 1's ``set_epoch(cur_epoch)`` sequence."""

    def __init__(self, loader, start_epoch=1):
        import torch

        self.torch = torch
        self.loader = loader
        self.next_epoch = start_epoch

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        self.loader.set_epoch(self.next_epoch)
        self.next_epoch += 1
        for b in self.loader:
            annot = np.concatenate(
                [b.boxes, b.labels[..., None].astype(np.float32)], axis=-1)
            yield {
                "img": self.torch.tensor(
                    np.ascontiguousarray(b.images.transpose(0, 3, 1, 2))),
                "annot": self.torch.tensor(annot),
            }


class RefTrainerStub:
    """The il_trainer surface train_process/training_iteration/IL_Loss/
    change_beta/Recorder actually touch (train.py:15-80,133-150,152-337;
    il_trainer.py:91-100). The data layer is the bridge above; save/delete
    are captured, not written (we evaluate the in-memory final model)."""

    def __init__(self, model, prev_model, params, optimizer, scheduler,
                 dataset_train, dataloader_train, dataset_replay,
                 dataloader_replay, cur_state):
        import collections

        self.model = model
        self.prev_model = prev_model
        self.params = params
        self.optimizer = optimizer
        self.scheduler = scheduler
        self.dataset_train = dataset_train
        self.dataloader_train = dataloader_train
        self.dataset_replay = dataset_replay
        self.dataloader_replay = dataloader_replay
        self.cur_state = cur_state
        self.cur_warm_stage = -1
        self.cur_epoch = 1
        self.end_epoch = 1
        self.bic = None
        self.agem = None
        self.mas = None
        self.backward_count = 0
        self.warm_status = 0
        self.loss_hist = collections.deque(maxlen=500)
        self.saved_epochs = []

    def is_backward(self):
        return self.backward_count == 0

    def backward_next(self, is_tail=False):
        if is_tail:
            self.backward_count = 0
        else:
            self.backward_count = (self.backward_count + 1) % self.params[
                "every_iter"]

    def warm_up(self, epoch):
        self.cur_warm_stage = -1  # warm_stage=0 path (il_trainer.py:341-346)

    def save_ckp(self, epoch_loss, epoch):
        self.saved_epochs.append(epoch)

    def auto_delete(self, state, epoch):
        pass

    def get_cur_state(self):
        return self.params.states[self.cur_state]

    def next_state(self):
        raise NotImplementedError("A/B drives one state per train_process "
                                  "call; transition is explicit in main()")


class RefParams(dict):
    """Flag surface of preprocessing.params.Params that the driven code
    reads, plus ``.states``."""

    def __init__(self, states, **kw):
        base = dict(
            alpha=0.25, gamma=2.0, ignore_past_class=False,
            new_ignore_past_class=False, decrease_positive=1.0,
            decrease_positive_by_IOU=False, enhance_on_new=False,
            persuado_label=False, distill=False, distill_logits=False,
            prototype_loss=False, classifier_loss=False, bic=False,
            clip_loss=True, clip_cls_loss=0.03, clip_replay_cls_loss=0.003,
            enhance_error=False, enhance_error_method="L2", ignore_GD=False,
            warm_layers=[], warm_stage=0, mas=False, agem=False,
            no_clip=False, debug=True, every_iter=1, beta_on_replay=0.9,
            beta_on_where="all", mix_data=False, mix_data_start=9999,
            final_correction=False, record=False, sample_num=0,
            description="None", scenario="ab",
        )
        base.update(kw)
        super().__init__(base)
        self.states = states


# ---------------------------------------------------------------------------


def build_cfg(root, args):
    from cl_object_detection_tpu.config import (
        DataConfig,
        DistillConfig,
        ILConfig,
        ModelConfig,
        ReplayConfig,
        ScheduleConfig,
        TrainConfig,
    )

    return TrainConfig(
        model=ModelConfig(depth=18, compute_dtype="float32"),
        data=DataConfig(
            batch_size=args.batch, min_side=args.size, max_side=args.size,
            height=args.size, width=args.size, max_boxes=8, num_workers=0,
            prefetch=0,
        ),
        schedule=ScheduleConfig(lr=args.lr, every_iter=1,
                                new_state_epoch=args.epochs1),
        il=ILConfig(
            scenario=(str(N_OLD), str(N_NEW)), end_state=1,
            init_method="none",
            distill=DistillConfig(enabled=True, logits=False),
            replay=ReplayConfig(sample_num=args.sample_num,
                                sample_method="random", mix_data=False,
                                enhance_error=True,
                                beta_on_replay=args.beta_replay),
            final_correction=False,
        ),
        checkpoint_dir=os.path.join(root, "ours", "checkpoint"),
        start_epoch=1,
        end_epoch=args.epochs0,
        record=False,
        seed=args.seed,
    )


def eval_model(coco, states, image_dir, data_cfg, state, model, variables,
               out_dir):
    from cl_object_detection_tpu.config import PredictConfig
    from cl_object_detection_tpu.eval.evaluator import Evaluator

    ev = Evaluator(coco, states, image_dir, data_cfg,
                   PredictConfig(max_detections=50), state_index=state)
    res = ev.run(model, variables, result_dir=out_dir)
    names = states[state].knowing_names
    old = names[:states[state].num_past_class]
    new = names[states[state].num_past_class:]
    def m(sub):
        return float(np.mean([res.ap50[n] for n in sub])) if sub else None
    return {"mAP50_all": m(names), "mAP50_old": m(old), "mAP50_new": m(new),
            "per_class": {n: float(res.ap50[n]) for n in names}}


def run_ours(args, root, toy):
    """Phase 1: this framework, scenario 3+2 through the production
    trainer; returns eval results per state + the exemplar ids used."""
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from cl_object_detection_tpu.train.loop import train_process
    from cl_object_detection_tpu.train.trainer import ILTrainer

    cfg = build_cfg(root, args)
    trainer = ILTrainer(cfg, os.path.join(toy, "train.json"),
                        os.path.join(toy, "images"),
                        workdir=os.path.join(root, "ours"))
    t0 = time.time()
    train_process(trainer)
    wall = time.time() - t0
    exemplar_ids = (list(trainer.dataset_replay.image_ids)
                    if trainer.dataset_replay else [])

    test_coco_path = os.path.join(toy, "test.json")
    from cl_object_detection_tpu.data.coco import CocoJson

    test_coco = CocoJson(test_coco_path)
    res = eval_model(test_coco, trainer.states, os.path.join(toy, "images"),
                     cfg.data, 1, trainer.model, trainer.variables(),
                     os.path.join(root, "ours", "val"))
    res["train_wall_s"] = round(wall, 1)
    return res, exemplar_ids, cfg


def run_reference(args, root, toy, exemplar_ids, cfg):
    """Phase 2: the reference's own train_process on CPU torch, fed the
    identical batch streams."""
    import torch

    # torch.optim lazily imports _dynamo, whose `str | torch.device`
    # annotations explode once torch.device is monkeypatched — import it
    # while torch.device is still real (parity-suite pattern)
    import torch._dynamo  # noqa: F401

    _patch_cpu()
    ref_model, ref_train = _import_reference()

    from cl_object_detection_tpu.data.coco import CocoJson
    from cl_object_detection_tpu.data.dataset import ILDataset, ReplayDataset
    from cl_object_detection_tpu.data.loader import BatchLoader
    from cl_object_detection_tpu.states import ILStates

    coco = CocoJson(os.path.join(toy, "train.json"))
    states = ILStates(list(coco.classes.values()), coco.classes_inverse,
                      [str(N_OLD), str(N_NEW)], False, 0)
    dataset = ILDataset(coco, states, os.path.join(toy, "images"),
                        split="train", start_state=0,
                        use_data_ratio=cfg.data.use_data_ratio)

    states_dicts = [
        dict(num_past_class=0, num_knowing_class=N_OLD, num_new_class=N_OLD),
        dict(num_past_class=N_OLD, num_knowing_class=N_OLD + N_NEW,
             num_new_class=N_NEW),
    ]
    common = dict(
        distill=True, distill_logits=False, enhance_error=True,
        clip_loss=True, every_iter=1,
        beta_on_replay=args.beta_replay, beta_on_where="all",
        root_dir=os.path.join(root, "ref"),
        lr=args.lr,
    )
    os.makedirs(os.path.join(root, "ref"), exist_ok=True)

    # ---- state 0 (joint over the first 3 classes) ----
    torch.manual_seed(args.seed)
    model = ref_model.create_retinanet(18, num_classes=N_OLD,
                                       pretrained=False)
    from train.il_trainer import WHITE_LIST_FOR_OPTIM, get_parameters

    def fresh_tools(model):
        opt = torch.optim.Adam(
            [{"params": get_parameters(model, WHITE_LIST_FOR_OPTIM)},
             {"params": model.classificationModel.output.parameters()}],
            lr=args.lr)
        sch = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[],
                                                   gamma=1.0)
        return opt, sch

    opt, sch = fresh_tools(model)
    params0 = RefParams(states_dicts, start_state=0, end_state=0,
                        start_epoch=1, end_epoch=args.epochs0,
                        new_state_epoch=args.epochs1, **common)
    loader0 = BatchLoader(dataset, cfg.data, shuffle=True, augment=True,
                          seed=args.seed)
    stub = RefTrainerStub(model, None, params0, opt, sch, dataset,
                          EpochLoader(loader0), None, None, cur_state=0)
    t0 = time.time()
    ref_train.train_process(stub)

    # ---- transition to state 1 (il_trainer.py:129-143 + 216-270) ----
    prev_model = ref_model.create_retinanet(18, num_classes=N_OLD,
                                            pretrained=False)
    prev_model.load_state_dict(copy.deepcopy(model.state_dict()))
    prev_model.training = False  # the reference's own (non-recursive)
    # flag flip, update_prev_model (il_trainer.py:142); BN is already eval
    # from construction (model.py:328 freeze_bn)
    model.next_state(N_NEW, None, "None")
    opt, sch = fresh_tools(model)

    dataset.next_state()
    loader1 = BatchLoader(dataset, cfg.data, shuffle=True, augment=True,
                          seed=args.seed)
    replay_ds = ReplayDataset(coco, states, os.path.join(toy, "images"),
                              per_num=args.sample_num, seed=args.seed)
    replay_ds.reset_by_img_ids(args.sample_num, exemplar_ids)
    replay_loader = BatchLoader(replay_ds, cfg.data,
                                batch_size=cfg.il.replay.sample_batch_size,
                                shuffle=True, augment=True, seed=args.seed,
                                is_replay=True)
    params1 = RefParams(states_dicts, start_state=1, end_state=1,
                        start_epoch=1, end_epoch=args.epochs1,
                        new_state_epoch=args.epochs1, **common)
    stub = RefTrainerStub(model, prev_model, params1, opt, sch, dataset,
                          EpochLoader(loader1), replay_ds,
                          EpochLoader(replay_loader), cur_state=1)
    ref_train.train_process(stub)
    wall = time.time() - t0

    # ---- evaluate the reference's final weights with OUR evaluator ----
    pt_path = os.path.join(root, "ref", "final_state1.pt")
    torch.save(model.state_dict(), pt_path)

    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.models.convert import (
        load_reference_checkpoint,
    )
    from cl_object_detection_tpu.models.retinanet import RetinaNet

    jm = RetinaNet(depth=18, num_classes=N_OLD + N_NEW, dtype=jnp.float32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, args.size, args.size, 3)))
    variables = load_reference_checkpoint(variables, pt_path, strict=True)

    test_coco = CocoJson(os.path.join(toy, "test.json"))
    res = eval_model(test_coco, states, os.path.join(toy, "images"),
                     cfg.data, 1, jm, variables,
                     os.path.join(root, "ref", "val"))
    res["train_wall_s"] = round(wall, 1)
    return res


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/reference_ab")
    p.add_argument("--epochs0", type=int, default=16)
    p.add_argument("--epochs1", type=int, default=12)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--sample_num", type=int, default=2)
    p.add_argument("--beta_replay", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train_images", type=int, default=40)
    p.add_argument("--test_images", type=int, default=25)
    p.add_argument("--tpu", action="store_true",
                   help="run OUR side on the real TPU (default CPU)")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    toy = os.path.join(args.out, "toy")
    from cl_object_detection_tpu.utils.toydata import make_toy_dataset

    make_toy_dataset(toy, num_images=args.train_images, classes=CLASSES,
                     image_size=(args.size, args.size), seed=args.seed,
                     split="train", style="separable")
    make_toy_dataset(toy, num_images=args.test_images, classes=CLASSES,
                     image_size=(args.size, args.size), seed=args.seed + 1,
                     split="test", style="separable")

    ours, exemplar_ids, cfg = run_ours(args, args.out, toy)
    print(f"[ours] state1 eval: {json.dumps(ours)}", flush=True)
    ref = run_reference(args, args.out, toy, exemplar_ids, cfg)
    print(f"[reference] state1 eval: {json.dumps(ref)}", flush=True)

    delta = {k: round(ours[k] - ref[k], 4)
             for k in ("mAP50_all", "mAP50_old", "mAP50_new")}
    out = {"config": vars(args), "ours": ours, "reference": ref,
           "delta_ours_minus_ref": delta}
    path = os.path.join(args.out, "reference_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"summary": delta}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
