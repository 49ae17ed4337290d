"""The IL trainer state machine.

Re-implements the reference ``IL_Trainer``
(/root/reference/train/il_trainer.py:45-380) around jitted train steps:

  * owns model/params/optimizer/datasets + every CL tool;
  * ordered tool init when entering an incremental state (il_trainer.py:79-89):
    prototyper -> replay -> bic -> replay loader -> agem -> prev(teacher)
    model -> mas -> pseudo-labels;
  * ``next_state`` sequence (il_trainer.py:316-335): MAS importance ->
    dataset class switch -> classifier expansion (+similarity warm-start)
    -> fresh optimizer -> replay/bic/agem re-init -> teacher update;
  * warm-up staged freezing (il_trainer.py:337-349) as gradient masks;
  * checkpoints via Orbax (utils/checkpoint.py) with JSON/npz sidecars
    replacing the reference's pickles.

Compiled-variant management: a train step is cached per
(is_replay, warm_kind) — each is one fused XLA program; changing state
recompiles (few states, by design — SURVEY.md §7 hard-part 2).
"""
from __future__ import annotations

import collections
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..data.coco import CocoJson
from ..data.dataset import BicDataset, ILDataset, ReplayDataset
from ..data.loader import BatchLoader
from ..il.agem import AGem
from ..il.bic import BicTrainer, carve_bic_val_set
from ..il.herding import HerdSampler
from ..il.losses import LossStatics
from ..il.mas import compute_importance
from ..il.prototype import (
    compute_prototype_features,
    prototype_herd_scores,
    prototype_herd_slot_scores,
    sample_by_scores,
    sample_by_slot_scores,
)
from ..il.pseudo_label import generate_pseudo_labels
from ..il.weight_init import compute_similarity
from ..models import create_retinanet, expand_classifier
from ..models.expand import classifier_class_vectors
from ..ops.anchors import anchors_for_shape
from ..states import ILStates
from ..utils.checkpoint import CheckpointManager
from .optim import lr_at_epoch, make_optimizer, set_beta1, set_learning_rate
from .state import TrainState
from .step import StepStatics, make_train_step

WARM_WHITE_LIST = {
    # reference WARM_UP_WHITE_LIST (params.py:11-14): which prefixes TRAIN
    "output": (("classification_head", "output"),),
    "fpn": (("classification_head",), ("regression_head",)),
    "resnet": (("fpn",), ("classification_head",), ("regression_head",)),
}


def trainable_mask(params, warm_kind: Optional[str]):
    """1.0 where trainable. None (no mask) outside warm stages."""
    if warm_kind is None:
        return None
    allow = WARM_WHITE_LIST[warm_kind]

    def leaf(path, x):
        keys = tuple(str(getattr(p, "key", "")) for p in path)
        for prefix in allow:
            if keys[: len(prefix)] == prefix:
                return jnp.ones_like(x)
        return jnp.zeros_like(x)

    return jax.tree_util.tree_map_with_path(leaf, params)


class ILTrainer:
    def __init__(self, cfg: TrainConfig, train_json: str, image_dir: str,
                 workdir: str = "."):
        self.cfg = cfg
        self.workdir = workdir
        self.coco = CocoJson(train_json)
        self.image_dir = image_dir
        self.states = ILStates(
            list(self.coco.classes.values()),
            self.coco.classes_inverse,
            list(cfg.il.scenario),
            shuffle_class=cfg.il.shuffle_class,
            shuffle_seed=cfg.il.shuffle_seed,
        )
        self.cur_state = cfg.il.start_state
        self.cur_epoch = 0
        self.end_epoch = 0
        self.cur_warm_stage = -1
        self._warm_kind: Optional[str] = None
        self._trainable = None
        self._steps: Dict[Any, Any] = {}
        # running loss window (reference il_trainer.py:57-60: a
        # deque(maxlen=500) of full per-batch losses, persisted in the
        # checkpoint and restored on mid-state resume, params.py:302-322)
        self.loss_hist: collections.deque = collections.deque(maxlen=500)

        self.ckpt = CheckpointManager(
            os.path.join(workdir, cfg.checkpoint_dir), cfg.il.scenario,
            cfg.keep_every,
        )

        # device mesh (SURVEY.md §2.2-2.3): when enabled, the train state
        # lives replicated (or head-TP-sharded) on the mesh and every batch
        # is sharded over the data axis — GSPMD inserts the gradient
        # all-reduce inside the existing compiled steps.
        self.mesh = None
        self._param_constraint = None
        if cfg.mesh.enabled:
            from ..parallel.mesh import create_mesh, make_param_constraint

            self.mesh = create_mesh(cfg.mesh)
            if cfg.mesh.zero1:
                # ZeRO-1: moments shard over 'data'; the step re-pins the
                # updated params to their canonical sharding
                self._param_constraint = make_param_constraint(
                    self.mesh, cfg.mesh.num_model, cfg.mesh.model_axis)
            ndata = self.mesh.shape[cfg.mesh.data_axis]
            if cfg.data.batch_size % ndata:
                raise ValueError(
                    f"batch_size {cfg.data.batch_size} not divisible by the "
                    f"data-axis size {ndata}")
            if (cfg.il.replay.sample_num > 0
                    and cfg.il.replay.sample_batch_size % ndata):
                raise ValueError(
                    f"replay sample_batch_size "
                    f"{cfg.il.replay.sample_batch_size} not divisible by "
                    f"the data-axis size {ndata} (set --sample_batch_size)")
            print(f"mesh: {dict(self.mesh.shape)} over "
                  f"{len(self.mesh.devices.flat)} devices")

        # datasets ------------------------------------------------------
        self.dataset_train = ILDataset(
            self.coco, self.states, image_dir, split="train",
            start_state=self.cur_state, use_data_ratio=cfg.data.use_data_ratio,
        )
        self.dataset_replay: Optional[ReplayDataset] = None
        self.replay_loader: Optional[BatchLoader] = None

        # model ---------------------------------------------------------
        h, w = cfg.data.height, cfg.data.width
        self._anchors_cache: Dict[Any, Any] = {}
        # warm the default frames (anchors_for serves any frame on demand)
        self._anchors_at(h, w)
        self._anchors_at(w, h)

        # cross-state resume (reference main.py:46-49, 82): entering state
        # k at epoch 1 starts from state k-1's newest checkpoint with the
        # PREVIOUS class count, then expands
        start_epoch = cfg.start_epoch or 1
        # reference-experiment interop (main.py:69-71): an explicit
        # --torch_ckpt replaces the native checkpoint as the resume
        # source — prev-state weights on a state entry, same-state
        # weights + Adam moments + scheduler LR on a mid-state resume
        ref_ckpt = cfg.torch_ckpt
        cross_state = (
            self.cur_state >= 1
            and start_epoch == 1
            and (ref_ckpt is not None
                 or self.ckpt.latest_epoch(self.cur_state - 1) is not None)
        )
        init_classes = (
            self.states[self.cur_state - 1].num_knowing_class
            if cross_state
            else self.states[self.cur_state].num_knowing_class
        )
        self.num_classes = init_classes
        self.model = create_retinanet(cfg.model, init_classes)
        rng = jax.random.PRNGKey(cfg.seed)
        variables = self.model.init(rng, jnp.zeros((1, min(h, 256), min(w, 256), 3)))
        if cross_state and ref_ckpt:
            from ..models.convert import load_reference_checkpoint

            variables = load_reference_checkpoint(
                variables, ref_ckpt, allow_pickle=cfg.trust_torch_ckpt)
        elif cross_state:
            tree, _ = self.ckpt.restore(self.cur_state - 1, -1)
            variables = {
                "params": jax.tree.map(jnp.asarray, tree["params"]),
                "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"]),
            }
        elif ref_ckpt:
            # same-state seed/resume from a reference checkpoint: the
            # optimizer graft happens after _new_train_state below
            from ..models.convert import load_reference_checkpoint

            variables = load_reference_checkpoint(
                variables, ref_ckpt, allow_pickle=cfg.trust_torch_ckpt)
        elif (
            start_epoch > 1
            and self.ckpt.nearest_epoch(self.cur_state, start_epoch - 1)
            is not None
        ):
            # mid-state resume (main.py:70-71): restore before tool init so
            # herding/similarity/pseudo-labels run on trained weights. With
            # --save_every k>1 the exact epoch may not exist — fall back to
            # the newest saved epoch <= start_epoch-1 (cli.train then
            # restarts the loop from that epoch + 1).
            resume_epoch = self.ckpt.nearest_epoch(self.cur_state, start_epoch - 1)
            tree, _ = self.ckpt.restore(self.cur_state, resume_epoch)
            variables = {
                "params": jax.tree.map(jnp.asarray, tree["params"]),
                "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"]),
            }
        elif cfg.model.pretrained:
            from ..models.convert import load_pretrained_backbone

            variables = load_pretrained_backbone(variables, cfg.model.pretrained)
        self._new_train_state(variables["params"], variables["batch_stats"])
        if ref_ckpt and not cross_state and start_epoch > 1:
            # mid-state resume continues the reference run's optimizer
            # (main.py:70-71 loads optimizer+scheduler only on same-state
            # resume; state entry rebuilds Adam, il_trainer.py:308-312)
            from ..models.convert import load_reference_optimizer

            try:
                new_opt, _info = load_reference_optimizer(
                    self.train_state.opt_state, self.train_state.params,
                    ref_ckpt, allow_pickle=cfg.trust_torch_ckpt,
                )
                self.train_state = self.train_state.replace(opt_state=new_opt)
            except ValueError as e:
                print(f"warning: optimizer state not imported ({e}); "
                      "continuing with fresh Adam moments")

        # CL tools ------------------------------------------------------
        self.teacher_model = None
        self.teacher_variables = None
        self._teacher_class_vectors = None
        self.mas_importance = None
        self.mas_prev_params = None
        self.agem: Optional[AGem] = None
        self.bic: Optional[BicTrainer] = None
        self.herd_sampler: Optional[HerdSampler] = None
        self.prototype_features: Optional[np.ndarray] = None

        if self.cur_state >= 1:
            # ordered init (il_trainer.py:79-89). Prototyper / herding /
            # similarity run on the PREVIOUS-state model; classifier
            # expansion happens before the tools that capture the model.
            self._init_prototyper()
            self._init_replay_dataset()
            if cross_state:
                self._expand_training_tools()
            self._init_bic()
            self._update_replay_loader()
            self._init_agem()
            self._update_prev_model()
            self._update_mas()
            self._add_pseudo_labels()
        self.train_loader = self._make_train_loader()

    # ------------------------------------------------------------------
    # infrastructure
    # ------------------------------------------------------------------
    def _new_train_state(self, params, batch_stats):
        tx = make_optimizer(self.cfg.schedule, params, use_clip=False)
        self.train_state = TrainState.create(
            params=params, batch_stats=batch_stats, tx=tx
        )
        if self.mesh is not None:
            from ..parallel.mesh import shard_train_state

            self.train_state = shard_train_state(
                self.mesh, self.train_state, self.cfg.mesh.num_model,
                self.cfg.mesh.model_axis, zero1=self.cfg.mesh.zero1,
                data_axis=self.cfg.mesh.data_axis,
            )
        self._steps.clear()

    def _put_batch(self, batch):
        """Batch arrays to device: sharded over the mesh's data axis
        (multi-host ready via make_array_from_process_local_data) or plain
        single-device asarray."""
        from ..parallel.mesh import put_step_batch

        return put_step_batch(self.mesh, batch)

    def _replicate(self, tree):
        """Pin a pytree on device (replicated over the mesh when present).
        Keeps per-step kwargs (teacher variables, MAS tensors) device-side
        instead of re-transferring host numpy every call."""
        if self.mesh is None:
            return jax.tree.map(jnp.asarray, tree)
        from ..parallel.mesh import replicate

        return jax.device_put(tree, replicate(self.mesh))

    def _proc_shard(self) -> Dict[str, int]:
        """Per-process batch sharding kwargs for STEP loaders (loaders that
        feed global_batch_from_local). Tool passes (MAS/prototype/
        similarity/herding/pseudo) keep full batches so every host derives
        identical sidecars."""
        if self.mesh is None or jax.process_count() == 1:
            return {}
        return {"process_index": jax.process_index(),
                "process_count": jax.process_count()}

    def _make_train_loader(self, sharded: bool = True) -> BatchLoader:
        return BatchLoader(
            self.dataset_train, self.cfg.data, shuffle=True, augment=True,
            seed=self.cfg.seed, **(self._proc_shard() if sharded else {}),
        )

    def _anchors_at(self, h: int, w: int):
        key = (h, w)
        if key not in self._anchors_cache:
            self._anchors_cache[key] = jnp.asarray(anchors_for_shape(h, w))
        return self._anchors_cache[key]

    def anchors_for(self, images: np.ndarray):
        from ..data.transforms import logical_image_hw

        h, w = logical_image_hw(images)
        return self._anchors_at(h, w)

    def variables(self):
        return self.train_state.variables

    # ------------------------------------------------------------------
    # train-step variants
    # ------------------------------------------------------------------
    def _loss_statics(self, is_replay: bool,
                      enhance_only: bool = False) -> LossStatics:
        cfg = self.cfg.il
        st = self.states[self.cur_state]
        warm_classifier = self._warm_kind == "output"
        incremental = self.cur_state > 0 and not is_replay and not warm_classifier
        return LossStatics(
            enhance_only=enhance_only,
            num_classes=self.num_classes,
            num_past_class=st.num_past_class,
            incremental=incremental,
            is_replay=is_replay,
            use_distill=cfg.distill.enabled and incremental,
            distill_logits=cfg.distill.logits,
            use_pseudo_progress=cfg.pseudo.enabled and incremental,
            use_enhance_error=cfg.replay.enhance_error,
            enhance_error_method=cfg.replay.enhance_error_method,
            use_enhance_on_new=cfg.enhance_on_new,
            use_classifier_loss=cfg.classifier_loss and incremental
            and cfg.distill.enabled,
            use_mas=cfg.mas.enabled and self.mas_importance is not None
            and not is_replay,
            # prototype loss switches on after start_epoch (losses.py:606)
            use_prototype=cfg.prototype.loss and incremental
            and self.prototype_features is not None
            and self.cur_epoch > cfg.prototype.start_epoch,
            ignore_gd=cfg.ignore_gd,
        )

    def _step_statics(self, correction: bool = False) -> StepStatics:
        warm_classifier = self._warm_kind == "output"
        st = self.states[self.cur_state]
        if correction:
            # reference correction_new_class (train.py:118-131): plain
            # optimizer.step per batch — no accumulation, no grad clip
            # (commented out upstream), no A-GEM
            return StepStatics(
                every_iter=1, use_clip=False, warm_classifier=False,
                num_past_class=st.num_past_class,
                num_knowing_class=st.num_knowing_class,
                num_anchors=self.cfg.model.num_anchors,
                use_agem=False,
            )
        return StepStatics(
            every_iter=self.cfg.schedule.every_iter,
            use_clip=not warm_classifier and self.cfg.schedule.grad_clip > 0,
            grad_clip=self.cfg.schedule.grad_clip,
            warm_classifier=warm_classifier,
            num_past_class=st.num_past_class,
            num_knowing_class=st.num_knowing_class,
            num_anchors=self.cfg.model.num_anchors,
            use_agem=self.cfg.il.agem.enabled,
        )

    def _get_step(self, is_replay: bool, frame, correction: bool = False):
        """One compiled train step per (batch-kind, warm-stage, state,
        canonical frame, prototype-phase); ``frame`` is the logical (h, w)."""
        statics = self._loss_statics(is_replay, enhance_only=correction)
        key = (is_replay, self._warm_kind, self.cur_state, frame,
               statics.use_prototype, correction)
        if key not in self._steps:
            anchors = self._anchors_at(*frame)
            self._steps[key] = make_train_step(
                self.model,
                self.teacher_model,
                anchors,
                self.cfg.il,
                self.cfg.focal,
                statics,
                self._step_statics(correction),
                # donate the TrainState buffers: the old state is dead the
                # moment the step returns (nothing else aliases it)
                donate=True,
                param_constraint=self._param_constraint,
            )
        return self._steps[key]

    # ------------------------------------------------------------------
    # warm-up (il_trainer.py:337-349, params.py:180-209)
    # ------------------------------------------------------------------
    def warm_up(self, epoch: int) -> None:
        cfg = self.cfg.warmup
        if cfg.warm_stage == 0:
            self.cur_warm_stage = -1
            self._warm_kind = None
            return
        stops = []
        acc = 1
        for e in cfg.warm_epoch[: cfg.warm_stage]:
            acc += e
            stops.append(acc)
        stage = -1
        for idx, stop in enumerate(stops):
            if epoch < stop:
                stage = idx
                break
        old = self._warm_kind
        self.cur_warm_stage = stage
        self._warm_kind = cfg.warm_layers[stage] if stage != -1 else None
        if old != self._warm_kind:
            self._steps.clear()
        self._trainable = trainable_mask(self.train_state.params, self._warm_kind)

    # ------------------------------------------------------------------
    # one training batch
    # ------------------------------------------------------------------
    def run_batch(self, batch, is_replay: bool = False,
                  sync_metrics: bool = True,
                  correction: bool = False) -> Dict[str, Any]:
        from ..data.transforms import logical_image_hw

        step = self._get_step(is_replay, logical_image_hw(batch.images),
                              correction=correction)
        kwargs = {}
        statics = self._loss_statics(is_replay, enhance_only=correction)
        if statics.use_distill:
            kwargs["teacher_variables"] = self.teacher_variables
        if statics.use_pseudo_progress:
            kwargs["pseudo_progress"] = jnp.asarray(
                self.cur_epoch / max(self.end_epoch, 1), jnp.float32
            )
        if statics.use_mas:
            kwargs["mas_prev_params"] = self.mas_prev_params
            kwargs["mas_importance"] = self.mas_importance
        if statics.use_prototype:
            # slot-averaged OLD-class prototypes, as the reference caches
            # them at IL_Loss init (losses.py:465-470)
            kwargs["prototype_features"] = jnp.asarray(
                self.prototype_features.mean(axis=1)
            )
        if statics.use_classifier_loss and self._teacher_class_vectors is not None:
            kwargs["classifier_vectors"] = self._teacher_class_vectors
        if (self.cfg.il.agem.enabled and self.agem is not None
                and not is_replay and not correction):
            if self.agem.replay_grad is None:
                self.agem.compute_replay_grad(self.variables())
            kwargs["replay_grad"] = self.agem.replay_grad
        if self._trainable is not None:
            kwargs["trainable_mask"] = self._trainable

        images, boxes, labels = self._put_batch(batch)
        self.train_state, metrics = step(
            self.train_state, images, boxes, labels, **kwargs,
        )
        if sync_metrics:
            return {k: float(v) for k, v in metrics.items()}
        # device-side scalars: the caller decides when to pay the host
        # round-trip (~30ms through the tunnel), keeping steps pipelined
        return metrics

    def set_replay_beta(self, is_replay: bool) -> None:
        """change_beta (train.py:133-150). No-op unless the batch kind
        actually flipped (the reference rewrites betas every iteration;
        here that would rebuild the optimizer tree per step for nothing)."""
        if getattr(self, "_beta_is_replay", None) == is_replay:
            return
        self._beta_is_replay = is_replay
        sched = self.cfg.schedule
        if is_replay:
            self.train_state = self.train_state.replace(
                opt_state=set_beta1(
                    self.train_state.opt_state,
                    self.cfg.il.replay.beta_on_replay,
                    self.cfg.il.replay.beta_on_where,
                )
            )
        else:
            self.train_state = self.train_state.replace(
                opt_state=set_beta1(self.train_state.opt_state, sched.beta1, "all")
            )

    def step_scheduler(self, epoch: int) -> None:
        lr = lr_at_epoch(self.cfg.schedule, epoch + 1)
        self.train_state = self.train_state.replace(
            opt_state=set_learning_rate(
                self.train_state.opt_state, lr,
                self.cfg.schedule.classifier_lr_scale,
            )
        )

    # ------------------------------------------------------------------
    # CL tool initialization (ordered; il_trainer.py:79-89)
    # ------------------------------------------------------------------
    def _prev_state_dataset(self, state: int) -> ILDataset:
        return ILDataset(self.coco, self.states, self.image_dir, split="train",
                         start_state=state)

    def _future_img_ids(self) -> List[int]:
        future: List[int] = []
        for i in range(self.cur_state, len(self.states)):
            future.extend(self.states[i].new_ids)
        return self.coco.get_imgs_by_cats(future)

    def _init_prototyper(self) -> None:
        cfg = self.cfg.il
        if not (cfg.prototype.loss or cfg.replay.sample_method == "prototype_herd"):
            return
        prev = self.cur_state - 1
        num_classes = self.states[prev].num_knowing_class
        prev_ds = self._prev_state_dataset(prev)
        loader = BatchLoader(prev_ds, self.cfg.data, shuffle=False, augment=False)
        cached = self.ckpt.load_array_sidecar(prev, "prototype_features")
        if cached is not None:
            self.prototype_features = np.asarray(list(cached.values())[0])
        else:
            self.prototype_features = compute_prototype_features(
                self.model, self.variables(), self.anchors_for, loader,
                num_classes, mesh=self.mesh,
            )
            self.ckpt.save_array_sidecar(
                prev, "prototype_features", [self.prototype_features]
            )

    def _init_replay_dataset(self) -> None:
        cfg = self.cfg.il.replay
        if cfg.sample_num <= 0:
            return
        self.dataset_replay = ReplayDataset(
            self.coco, self.states, self.image_dir, per_num=cfg.sample_num,
            seed=self.cfg.seed,
        )
        prev = self.cur_state - 1
        if cfg.sample_method == "herd":
            if self.herd_sampler is None:
                self.herd_sampler = HerdSampler(self.model, cfg.herd_ratio_threshold)
            prev_ds = self._prev_state_dataset(prev)
            self.herd_sampler.sample(
                self.variables(), prev_ds, self.cfg.data, cfg.sample_num,
                future_img_ids=self._future_img_ids(), mesh=self.mesh,
            )
            self.dataset_replay.reset_explicit(
                cfg.sample_num, self.herd_sampler.examplar_list, self.cur_state
            )
        elif cfg.sample_method == "prototype_herd":
            assert self.prototype_features is not None
            prev_ds = self._prev_state_dataset(prev)
            future = set(self._future_img_ids())
            # exemplars ACCUMULATE across states like the herding path
            # (reference keeps every past state's sample files,
            # il_trainer.py:173-225): the newest scores only cover the
            # previous state's NEW classes, so earlier states' picks must
            # persist or the oldest classes silently lose replay coverage
            if not hasattr(self, "_proto_exemplars"):
                self._proto_exemplars: List[int] = []
            if cfg.prototype_herd_mode == "slots":
                slot_scores, counts = prototype_herd_slot_scores(
                    self.model, self.variables(), self.anchors_for, prev_ds,
                    self.cfg.data, self.prototype_features, mesh=self.mesh,
                )
                st = self.states[prev]
                picked = sample_by_slot_scores(
                    slot_scores, counts, cfg.sample_num,
                    classes=range(st.num_past_class, st.num_knowing_class),
                    already=self._proto_exemplars, exclude=future,
                    num_anchors=self.prototype_features.shape[1],
                )
            else:
                scores = prototype_herd_scores(
                    self.model, self.variables(), self.anchors_for, prev_ds,
                    self.cfg.data, self.prototype_features, mesh=self.mesh,
                )
                scores = {
                    c: {i: s for i, s in d.items() if i not in future}
                    for c, d in scores.items()
                }
                picked = sample_by_scores(scores, cfg.sample_num,
                                          already=self._proto_exemplars)
            self._proto_exemplars.extend(
                i for lst in picked.values() for i in lst)
            self.dataset_replay.reset_explicit(
                cfg.sample_num, list(self._proto_exemplars), self.cur_state)
        else:  # random
            self.dataset_replay.reset_by_state(self.cur_state)

        # exemplar record (il_trainer.py:237-241)
        self.ckpt.save_sidecar(
            self.cur_state, "examplar", list(self.dataset_replay.image_ids)
        )
        self._write_examplar_outputs()

    def _write_examplar_outputs(self) -> None:
        """examplar.txt (one image id per line) + examplar.png montage
        (il_trainer.py:230-257): sample_num columns per old class, class
        name captioned. Composited with cv2/numpy (no matplotlib dep)."""
        state_dir = self.ckpt.state_dir(self.cur_state)
        img_ids = list(self.dataset_replay.image_ids)
        with open(os.path.join(state_dir, "examplar.txt"), "w") as f:
            for img_id in img_ids:
                f.write(f"{img_id}\n")

        if not self.cfg.output_examplar or not img_ids:
            return
        try:
            import cv2
        except Exception:
            return
        per = self.cfg.il.replay.sample_num
        num_classes = max(len(img_ids) // per, 1)
        names = self.states[len(self.states) - 1].knowing_names[:num_classes]
        th, tw = 180, 240  # thumbnail cell
        rows = []
        for r in range(num_classes):
            cells = []
            for c in range(per):
                k = r * per + c
                cell = np.zeros((th, tw, 3), np.uint8)
                if k < len(img_ids):
                    info = self.coco.imgs[img_ids[k]]
                    path = os.path.join(self.image_dir, info["file_name"])
                    im = cv2.imread(path)
                    if im is not None:
                        cell = cv2.resize(im, (tw, th))
                    cv2.putText(cell, names[r] if r < len(names) else "?",
                                (4, 16), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                                (0, 255, 0), 1, cv2.LINE_AA)
                cells.append(cell)
            rows.append(np.concatenate(cells, axis=1))
        cv2.imwrite(os.path.join(state_dir, "examplar.png"),
                    np.concatenate(rows, axis=0))

    def _update_replay_loader(self) -> None:
        if self.dataset_replay is None:
            return
        self.replay_loader = BatchLoader(
            self.dataset_replay, self.cfg.data,
            batch_size=self.cfg.il.replay.sample_batch_size,
            shuffle=True, augment=True, seed=self.cfg.seed, is_replay=True,
            **self._proc_shard(),
        )

    def _init_bic(self) -> None:
        cfg = self.cfg.il
        if not cfg.bic.enabled:
            return
        if self.dataset_replay is None:
            raise ValueError("BiC requires replay (init_replay_dataset first)")
        carry = self.bic.params if getattr(self, "bic", None) else None
        st = self.states[self.cur_state]
        bic_ids, seen_lists, train_ids, replay_ids = carve_bic_val_set(
            self.dataset_train.image_ids,
            self.dataset_replay.image_ids,
            self.dataset_replay.seen_class_ids,
            self.dataset_train.seen_class_ids,
            st.new_ids,
            self.coco,
            cfg.replay.sample_num,
            cfg.bic.ratio,
        )
        self.dataset_train.image_ids = train_ids
        self.dataset_replay.image_ids = replay_ids
        bic_ds = BicDataset(self.coco, self.states, self.image_dir,
                            bic_ids, seen_lists)
        bic_loader = BatchLoader(bic_ds, self.cfg.data, shuffle=True,
                                 augment=True, seed=self.cfg.seed,
                                 **self._proc_shard())
        counts = [s.num_new_class for s in self.states.states]
        self.bic = BicTrainer(
            self.model, self.anchors_for, cfg, self.cfg.focal, cfg.bic,
            counts, self.cur_state, st.num_past_class, bic_loader,
            mesh=self.mesh,
        )
        if carry is not None:
            # earlier states' trained (alpha, beta) persist; only the new
            # state's slot trains (the step's gradient mask)
            self.bic.params = carry

    def _init_agem(self) -> None:
        if not self.cfg.il.agem.enabled:
            self.agem = None
            return
        if self.replay_loader is None:
            raise ValueError("A-GEM requires the replay dataset")
        st = self.states[self.cur_state]
        statics = LossStatics(
            num_classes=self.num_classes, num_past_class=st.num_past_class,
            incremental=False, is_replay=True,
        )
        self.agem = AGem(
            self.model, self.anchors_for, self.cfg.il, self.cfg.focal,
            statics, self.replay_loader, mesh=self.mesh,
        )

    def _update_prev_model(self, force: bool = False) -> None:
        cfg = self.cfg.il
        if self.cur_state == 0:
            raise ValueError("initial state has no previous state")
        if not force and not cfg.distill.enabled and not cfg.mas.enabled:
            return
        prev = self.cur_state - 1
        prev_classes = self.states[prev].num_knowing_class
        self.teacher_model = create_retinanet(self.cfg.model, prev_classes)
        tree, _ = self.ckpt.restore(prev, -1)
        # pin on device once (replicated over the mesh): the teacher tree
        # rides into every distill step as a kwarg — host numpy here would
        # re-transfer the full model every iteration
        self.teacher_variables = self._replicate({
            "params": tree["params"],
            "batch_stats": tree["batch_stats"],
        })
        self.mas_prev_params = self.teacher_variables["params"]
        if cfg.classifier_loss:
            self._teacher_class_vectors = jnp.asarray(
                classifier_class_vectors(tree["params"],
                                         self.cfg.model.num_anchors)
            )
        self._steps.clear()

    def _update_mas(self) -> None:
        if not self.cfg.il.mas.enabled:
            return
        prev = self.cur_state - 1
        cached = self.ckpt.load_array_sidecar(
            prev, "mas_importance", like=None
        )
        if cached is not None:
            # restore into the CURRENT params structure where shapes match
            flat, treedef = jax.tree_util.tree_flatten_with_path(
                self.train_state.params
            )
            leaves = []
            for k, v in flat:
                key = jax.tree_util.keystr(k)
                arr = cached.get(key)
                leaves.append(
                    jnp.asarray(arr) if arr is not None and arr.shape == v.shape
                    else jnp.zeros_like(v)
                )
            self.mas_importance = jax.tree_util.tree_unflatten(treedef, leaves)
        else:
            loader = self._make_train_loader(sharded=False)
            self.mas_importance = compute_importance(
                self.model, self.variables(), self.anchors_for, loader,
                mesh=self.mesh,
            )
            self.ckpt.save_array_sidecar(prev, "mas_importance", self.mas_importance)
        self.mas_importance = self._replicate(self.mas_importance)

    def _add_pseudo_labels(self) -> None:
        cfg = self.cfg.il
        if not cfg.pseudo.enabled:
            return
        if self.teacher_model is None:
            # force: pseudo-labeling needs the frozen previous-state model
            # even when distillation and MAS are both off
            self._update_prev_model(force=True)
        pseudo = generate_pseudo_labels(
            self.teacher_model, self.teacher_variables, self.dataset_train,
            self.cfg.data, cfg.pseudo, self.states.inverse_label_map(),
            mesh=self.mesh,
        )
        self.dataset_train.pseudo_labels = pseudo
        self.train_loader = self._make_train_loader()

    # ------------------------------------------------------------------
    # state transition (il_trainer.py:316-335)
    # ------------------------------------------------------------------
    def next_state(self) -> None:
        cfg = self.cfg.il
        prev_params = self.train_state.params

        # 1. MAS importance on the OLD state's data with the OLD model
        if cfg.mas.enabled:
            self._update_mas_for_next()
        self.cur_state += 1

        # 2. dataset moves to the new state's classes
        self.dataset_train.next_state()

        # 3. prototyper for the new state (internally gated on
        # prototype.loss / prototype_herd — NOT on replay: the prototype
        # loss works without exemplars)
        self._init_prototyper()

        # 4+5. classifier expansion + similarity warm-start + fresh optimizer
        self._expand_training_tools(prev_params)

        # 6. replay / bic / agem re-init — REBUILT every state: BiC's
        # jitted step bakes the trained slot index + logits width and the
        # held-out carve, A-GEM bakes the replay loader + BN/classifier
        # mask shapes; state-1 objects would crash (or silently train the
        # wrong slot) at state >= 2. Learned BiC alpha/beta carry over.
        if self.dataset_replay is not None or cfg.replay.sample_num > 0:
            self._init_replay_dataset()
            self._init_bic()
            self._update_replay_loader()
            self._init_agem()

        self.train_loader = self._make_train_loader()

        # 7. teacher = previous state's latest checkpoint
        self._update_prev_model()
        if cfg.mas.enabled:
            self.mas_prev_params = self.teacher_variables["params"] \
                if self.teacher_variables else prev_params

        # 8. pseudo-labels for the new state's images
        self._add_pseudo_labels()

    def _expand_training_tools(self, prev_params=None) -> None:
        """update_training_tools (il_trainer.py:289-314): similarity-based
        warm-start + classifier expansion + fresh Adam. ``self.model`` must
        still be the PREVIOUS-state model (similarity needs it)."""
        cfg = self.cfg.il
        prev_params = prev_params if prev_params is not None else self.train_state.params
        st = self.states[self.cur_state]
        method = cfg.init_method
        similarity = None
        if method in ("mean", "large", "onlyNegative") and st.num_past_class > 0:
            cached = self.ckpt.load_array_sidecar(self.cur_state - 1, "similarity")
            if cached is not None:
                similarity = np.asarray(list(cached.values())[0])
            else:
                # the reference explicitly disables the Augmenter for the
                # similarity pass (weight_init.py:30-31): deterministic,
                # unflipped images
                loader = BatchLoader(
                    self.dataset_train, self.cfg.data, shuffle=False,
                    augment=False,
                )
                similarity = compute_similarity(
                    self.model, self.variables(), self.anchors_for, loader,
                    num_new=st.num_new_class,
                    num_old=st.num_past_class,
                    mesh=self.mesh,
                )
                self.ckpt.save_array_sidecar(
                    self.cur_state - 1, "similarity", [similarity]
                )
        new_params = expand_classifier(
            jax.tree.map(np.asarray, prev_params),
            st.num_new_class,
            num_anchors=self.cfg.model.num_anchors,
            prior=self.cfg.model.prior,
            similarity=similarity,
            method=method,
        )
        if cfg.scail and st.num_past_class > 0:
            # SCAIL standardization (il/scail.py; completes the reference's
            # IL_method/scail.py:7-35 stub): align the freshly expanded
            # new-class filters' weight-magnitude profile with the old
            # classes' ranked mean before training starts
            from ..il.scail import standardize_new_classifier

            new_params = standardize_new_classifier(
                new_params, st.num_past_class,
                num_anchors=self.cfg.model.num_anchors,
            )
            print(f"scail: standardized {st.num_new_class} new-class "
                  "filters to the old ranked-mean profile")
        self.num_classes = st.num_knowing_class
        self.model = create_retinanet(self.cfg.model, self.num_classes)
        self._new_train_state(new_params, self.train_state.batch_stats)

    def _update_mas_for_next(self) -> None:
        loader = self._make_train_loader(sharded=False)
        self.mas_importance = compute_importance(
            self.model, self.variables(), self.anchors_for, loader,
            mesh=self.mesh,
        )
        self.ckpt.save_array_sidecar(self.cur_state, "mas_importance",
                                     self.mas_importance)
        # pin on device like _update_mas does — it rides into every train
        # step as a kwarg (host numpy would re-transfer per iteration)
        self.mas_importance = self._replicate(self.mas_importance)

    # ------------------------------------------------------------------
    def save(self, epoch: int, epoch_loss: Optional[List[float]] = None) -> None:
        """NB: a half-filled gradient accumulator (every_iter > 1 with an
        epoch length not divisible by it) is not persisted — resume restarts
        accumulation cleanly, same as the reference (torch checkpoints drop
        .grad buffers too). acc_count rides in the meta for diagnostics."""
        il_meta = {
            "state": self.cur_state,
            "acc_count": int(self.train_state.acc_count),
            "epoch": epoch,
            "num_classes": self.num_classes,
            "knowing_class_ids": self.states[self.cur_state].knowing_ids,
            "exemplar_ids": list(self.dataset_replay.image_ids)
            if self.dataset_replay else [],
            "config": self.cfg.to_json(),
            # loss history rides in the checkpoint like the reference's
            # (params.py:307-322): the 500-deep running-loss window plus
            # this epoch's per-iteration total losses
            "loss_hist": [float(x) for x in self.loss_hist],
            "epoch_loss": ([float(x) for x in epoch_loss]
                           if epoch_loss is not None else None),
        }
        if self.bic is not None:
            il_meta["bic"] = {
                "alphas": np.asarray(self.bic.params.alphas).tolist(),
                "betas": np.asarray(self.bic.params.betas).tolist(),
            }
        self.ckpt.save(
            self.cur_state, epoch, self.train_state, il_meta,
            async_save=getattr(self.cfg, "async_checkpoint", False),
        )

    def resume(self, state: int, epoch: int = -1) -> int:
        """Restore params + optimizer state (the reference restores
        model/optimizer/scheduler on mid-state resume, params.py:282-305).
        The optimizer tree restores INTO the live structure so optax
        NamedTuple states keep their types. A requested epoch that was
        never saved (save_every > 1 / retention) falls back to the newest
        saved epoch below it."""
        if epoch >= 0 and epoch not in self.ckpt.epochs(state):
            nearest = self.ckpt.nearest_epoch(state, epoch)
            if nearest is None:
                raise FileNotFoundError(
                    f"no checkpoint at or below epoch {epoch} for state {state}"
                )
            print(f"resume: epoch {epoch} not saved; using epoch {nearest}")
            epoch = nearest
        target = {
            "params": self.train_state.params,
            "batch_stats": self.train_state.batch_stats,
            "opt_state": self.train_state.opt_state,
            "step": self.train_state.step,
        }
        tree, il_meta = self.ckpt.restore(state, epoch, target=target)
        self.train_state = self.train_state.replace(
            params=jax.tree.map(jnp.asarray, tree["params"]),
            batch_stats=jax.tree.map(jnp.asarray, tree["batch_stats"]),
            opt_state=tree["opt_state"],
            step=jnp.asarray(tree["step"]),
        )
        if self.mesh is not None:
            from ..parallel.mesh import shard_train_state

            self.train_state = shard_train_state(
                self.mesh, self.train_state, self.cfg.mesh.num_model,
                self.cfg.mesh.model_axis, zero1=self.cfg.mesh.zero1,
                data_axis=self.cfg.mesh.data_axis,
            )
        if il_meta and "bic" in il_meta and self.bic is not None:
            self.bic.params.load(il_meta["bic"])
        if il_meta and il_meta.get("loss_hist"):
            # restore the running-loss window (reference main.py:71 +
            # params.py:302-305 — mid-state resume continues the deque)
            self.loss_hist = collections.deque(
                il_meta["loss_hist"], maxlen=500)
        return il_meta["epoch"] if il_meta else 0
