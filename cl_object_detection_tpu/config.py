"""Typed configuration tree.

Replaces the reference's argparse->dict ``Params`` object
(/root/reference/main.py:85-180, /root/reference/preprocessing/params.py:124-178)
with a single frozen dataclass tree. Every knob of the reference parser is
represented; TPU-specific knobs (static image shape, mesh axes, dtype policy)
are new.

All defaults mirror the reference defaults recorded in SURVEY.md §6
("hyperparameter defaults worth freezing").
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelConfig:
    """RetinaNet architecture knobs (reference: retinanet/model.py)."""
    depth: int = 50                    # ResNet depth in {18,34,50,101,152}
    fpn_channels: int = 256            # FPN + head trunk width
    head_layers: int = 4               # 3x3 conv stack depth in each head
    num_anchors: int = 9               # 3 ratios x 3 scales per cell
    prior: float = 0.01                # classification bias init prior
                                       # (reference model.py:321-327)
    pyramid_levels: Tuple[int, ...] = (3, 4, 5, 6, 7)
    pretrained: Optional[str] = None   # path to converted backbone npz
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"    # MXU-friendly activations
    input_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    input_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
                                       # on-device normalization stats for
                                       # uint8 input batches (must match
                                       # DataConfig.mean/std)
    remat: bool = False                # jax.checkpoint residual blocks:
                                       # ~2x activation memory reduction for
                                       # larger train batches, extra FLOPs


@dataclass(frozen=True)
class FocalConfig:
    """Focal-loss constants (reference losses.py:253; main.py alpha/gamma)."""
    alpha: float = 0.25
    gamma: float = 2.0
    fg_iou: float = 0.5                # anchors with maxIoU >= fg are positive
    bg_iou: float = 0.4                # anchors with maxIoU < bg are negative
    bbox_std: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    smooth_l1_beta: float = 1.0 / 9.0


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DataConfig:
    """Dataset + static-shape input pipeline.

    The reference pads each batch to its own ragged max H/W
    (dataloader.py:327-364); on TPU everything compiles to ONE canonical
    shape: images resized so min side ~608 / max side <= 1024 (reference
    Resizer, dataloader.py:366-398) then padded to (height, width).
    """
    root_dir: str = "."
    dataset: str = "voc2007"
    train_json: Optional[str] = None   # explicit path overrides root_dir layout
    val_json: Optional[str] = None
    image_dir_train: Optional[str] = None
    image_dir_val: Optional[str] = None
    batch_size: int = 4
    min_side: int = 608
    max_side: int = 1024
    height: int = 640                  # canonical padded H (multiple of 128)
    width: int = 1024                  # canonical padded W (multiple of 128)
    max_boxes: int = 100               # GT padding capacity (-1 sentinel rows)
    hflip_prob: float = 0.5            # Augmenter (dataloader.py:400-421)
    shape_buckets: Tuple[Tuple[int, int], ...] = ()
                                       # extra canonical frames (h, w),
                                       # landscape form, each dim %32: an
                                       # image pads into the smallest
                                       # fitting frame (transposed for
                                       # portrait). Fewer padded pixels,
                                       # one compiled step per frame.
    s2d_stem: bool = False             # emit 2x2 space-to-depth batches
                                       # (B,H/2,W/2,12) for the phase-packed
                                       # stem conv (models/resnet.StemConv)
    fused_stem: bool = False           # emit 4x4 space-to-depth batches
                                       # (B,H/4,W/4,64): the whole stem
                                       # (conv+BN+ReLU+pool) runs as one
                                       # Pallas kernel (ops/stem_pallas.py,
                                       # measured 2.5x the XLA stem)
    transfer_dtype: str = "float32"    # "uint8": skip host normalization,
                                       # ship raw 8-bit pixels (4x less
                                       # host->device infeed); the backbone
                                       # normalizes on device with
                                       # ModelConfig.input_mean/std
    use_data_ratio: float = 1.0        # truncate train set (dataloader.py:56-60)
    num_workers: int = 2
    prefetch: int = 2
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# Optimization
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ScheduleConfig:
    """Optimizer/schedule (reference main.py:57-62, train.py:48-72)."""
    lr: float = 1e-5
    scheduler_milestone: Tuple[int, ...] = (40,)   # epoch milestones
    scheduler_decay: float = 0.1
    grad_clip: float = 0.1
    every_iter: int = 2                # gradient accumulation factor
    new_state_epoch: int = 60          # epochs per incremental state
    beta1: float = 0.9
    beta2: float = 0.999
    classifier_lr_scale: float = 1.0   # second Adam param-group (output conv)


@dataclass(frozen=True)
class WarmupConfig:
    """Staged layer unfreezing (reference params.py:180-209, train.py:58-66)."""
    warm_stage: int = 0
    warm_epoch: Tuple[int, ...] = (10, 10)
    warm_layers: Tuple[str, ...] = ("output", "resnet")
    # warm_white_list semantics (params.py:11-14): each stage trains ONLY
    #   'output' -> classification head output conv
    #   'fpn'    -> both heads
    #   'resnet' -> fpn + both heads


# ---------------------------------------------------------------------------
# Incremental-learning methods
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DistillConfig:
    """Frozen-teacher distillation (reference losses.py:660-737)."""
    enabled: bool = False
    logits: bool = False               # distill logits vs probabilities
    feat_weight: float = 1.0           # cosine feature loss over 5 FPN maps
    teacher_fg_thresh: float = 0.05    # teacher prob > t counts as teacher-fg


@dataclass(frozen=True)
class ReplayConfig:
    """Exemplar replay (reference dataloader.py:201-291, train.py:250-298)."""
    sample_num: int = 0                # exemplars per class; 0 = off
    sample_method: str = "herd"        # random | herd | prototype_herd
    # prototype_herd only: "slots" = faithful per-(class, anchor-slot)
    # ranking + slot-ordered budget split (reference
    # IL_method/prototype.py:143-220, train/il_trainer.py:173-225);
    # "classmean" = one ranking per class vs the slot-averaged prototype
    prototype_herd_mode: str = "slots"
    sample_batch_size: int = 5
    mix_data: bool = False             # interleave replay into the epoch
    mix_data_start: int = 0
    beta_on_replay: float = 0.9        # Adam beta1 used on replay batches
    beta_on_where: str = "all"         # which param group gets the swap
    enhance_error: bool = False        # penalize new-class scores on replay
    enhance_error_method: str = "L2"   # L1 | L2 | L3
    herd_ratio_threshold: float = 0.25 # fg-area ratio filter (herd_sample.py:13)


@dataclass(frozen=True)
class MASConfig:
    """Memory-Aware Synapses (reference IL_method/mas.py)."""
    enabled: bool = False
    ratio: float = 1.0


@dataclass(frozen=True)
class AGEMConfig:
    """Averaged-GEM gradient projection (reference IL_method/agem.py)."""
    enabled: bool = False
    # The reference recomputes the replay gradient EVERY iteration
    # (train.py:233-234). refresh_every=1 reproduces that; larger values are
    # the documented fast path (SURVEY.md §7 hard-part 4).
    refresh_every: int = 1


@dataclass(frozen=True)
class BiCConfig:
    """Bias-correction layers (reference IL_method/bic.py)."""
    enabled: bool = False
    ratio: float = 0.1                 # val:train split carved from streams
    lr: float = 1e-3
    epochs_per_round: int = 1


@dataclass(frozen=True)
class PseudoLabelConfig:
    """Old-model pseudo-labels on new-state images (persuado_label.py)."""
    enabled: bool = False
    score_thresh: float = 0.7
    iou_thresh: float = 0.35
    max_labels_per_image: int = 32     # static capacity (TPU-side buffers)


@dataclass(frozen=True)
class PrototypeConfig:
    """Prototype feature anchoring (reference IL_method/prototype.py)."""
    loss: bool = False
    margin: float = 600.0              # L2 distance margin (losses.py:236)
    weight: float = 0.1
    start_epoch: int = 5               # enabled after epoch 5 (losses.py:606)


@dataclass(frozen=True)
class ILConfig:
    """Scenario + all continual-learning method switches.

    Mirrors the IL section of the reference parser (main.py:104-166).
    """
    scenario: Tuple[str, ...] = ("20",)
    shuffle_class: bool = False
    shuffle_seed: int = 0
    start_state: int = 0
    end_state: Optional[int] = None

    distill: DistillConfig = field(default_factory=DistillConfig)
    replay: ReplayConfig = field(default_factory=ReplayConfig)
    mas: MASConfig = field(default_factory=MASConfig)
    agem: AGEMConfig = field(default_factory=AGEMConfig)
    bic: BiCConfig = field(default_factory=BiCConfig)
    pseudo: PseudoLabelConfig = field(default_factory=PseudoLabelConfig)
    prototype: PrototypeConfig = field(default_factory=PrototypeConfig)

    # classifier expansion warm-start: mean | large | onlyNegative | none
    init_method: str = "mean"
    scail: bool = False                # SCAIL classifier standardization at
                                       # state entry: rescale the expanded
                                       # new-class filters to the old
                                       # classes' ranked-mean weight profile
                                       # (completes reference IL_method/
                                       # scail.py:7-35; il/scail.py)
    classifier_loss: bool = False      # cosine-margin old-vs-new (losses.py:491)
    classifier_loss_delta: float = 0.5

    # focal-loss IL variants (losses.py:309-393)
    ignore_past_class: bool = False
    new_ignore_past_class: bool = False
    decrease_positive: float = 1.0
    decrease_positive_by_iou: bool = False
    enhance_on_new: bool = False
    ignore_gd: bool = False

    # loss clipping (main.py:154-156)
    clip_loss: bool = True
    clip_cls_loss: float = 0.03
    clip_replay_cls_loss: float = 0.003

    final_correction: bool = False


# ---------------------------------------------------------------------------
# Inference / eval
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PredictConfig:
    """Detection post-processing (reference model.py:494-605)."""
    score_thresh: float = 0.05
    nms_iou: float = 0.5
    pre_nms_topk: int = 1024           # static candidate capacity
                                       # (multiple of 256 for the Pallas kernel)
    max_detections: int = 300          # static output capacity
    use_pallas_nms: bool = True        # fused TPU kernel (auto-off on CPU)
    nms_impl: str = "iterative"        # "iterative" (fixed-point matvec,
                                       # default: 0.54 ms single / 1.22 ms
                                       # per B16 at k=1024 on v5e, and e2e
                                       # == pallas_fp) | "pallas_fp" (ONE
                                       # Pallas kernel for the whole batch,
                                       # suppression matrix VMEM-resident:
                                       # 0.81 ms/B16, the stage-level
                                       # batched winner) | "scan";
                                       # legacy "pallas" aliases pallas_fp
    topk_method: str = "exact"         # pre-NMS candidate select: "exact"
                                       # (lax.top_k) | "approx"
    bbox_std: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
                                       # must match FocalConfig.bbox_std
                                       # (encode/decode pair)
                                       # (lax.approx_max_k, ~6x faster over
                                       # 123k anchors, >=0.95 recall — tail
                                       # candidates only; see ops/nms.py)
    quantize: bool = False             # int8 convs on the predict path
                                       # (dynamic PTQ, ops/quant.py); head
                                       # output convs stay bf16


# ---------------------------------------------------------------------------
# Parallelism
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. The reference is single-GPU (SURVEY.md §2.2);
    here data-parallel over ICI is the first-class path, with an optional
    model axis for head-channel tensor parallelism.

    ``enabled=True`` makes the PRODUCTION trainer (cli.train / ILTrainer)
    create the mesh at init, replicate/TP-shard the train state over it,
    and shard every batch on the data axis
    (jax.make_array_from_process_local_data, multi-host ready); GSPMD
    inserts the gradient all-reduce. Batch sizes (train and replay) must
    be multiples of the data-axis size."""
    enabled: bool = False
    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1                 # -1: all devices on the data axis
    num_model: int = 1
    zero1: bool = False                # ZeRO-1: shard the Adam moments over
                                       # the data axis (1/ndata optimizer
                                       # memory; GSPMD all-gathers the
                                       # param updates at step time)


# ---------------------------------------------------------------------------
# Top-level
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    focal: FocalConfig = field(default_factory=FocalConfig)
    data: DataConfig = field(default_factory=DataConfig)
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)
    warmup: WarmupConfig = field(default_factory=WarmupConfig)
    il: ILConfig = field(default_factory=ILConfig)
    predict: PredictConfig = field(default_factory=PredictConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    seed: int = 0
    start_epoch: Optional[int] = None
    end_epoch: Optional[int] = None
    checkpoint_dir: str = "checkpoint"
    keep_every: int = 5                # retention: keep epoch%5==0 + latest
    save_every: int = 1                # checkpoint every N epochs (+ final);
                                       # saving pulls ~0.5GB through the
                                       # device tunnel, a real cost per epoch
    async_checkpoint: bool = True      # snapshot on-device, pull + write in
                                       # a background thread (atomic rename)
                                       # so the train loop never stalls
    record: bool = True                # TensorBoard recording
    profile_dir: Optional[str] = None  # capture a jax.profiler trace of the
                                       # SECOND training epoch (first epoch
                                       # is compile-dominated) into this dir
    description: str = "None"
    debug: bool = False
    val_after_train: bool = False
    output_examplar: bool = True
    # reference-experiment interop: seed this run from a reference .pt
    # checkpoint (params.py:307-322) — weights always; Adam moments +
    # scheduler LR too on a same-state resume (start_epoch > 1,
    # main.py:70-71). trust_torch_ckpt permits full unpickling (the
    # scheduler state needs it), which executes code in the file.
    torch_ckpt: Optional[str] = None
    trust_torch_ckpt: bool = False

    # ------------------------------------------------------------------
    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "TrainConfig":
        return _from_dict(TrainConfig, json.loads(text))


# ---------------------------------------------------------------------------
# (De)serialization + dotted-path overrides
# ---------------------------------------------------------------------------

def _from_dict(cls, d):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in d.items():
        if key not in hints:
            raise KeyError(f"unknown config field {cls.__name__}.{key}")
        f = hints[key]
        sub = f.type if isinstance(f.type, type) else None
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else None  # type: ignore[misc]
        if dataclasses.is_dataclass(default):
            kwargs[key] = _from_dict(type(default), value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def apply_overrides(cfg: TrainConfig, overrides: Sequence[Tuple[str, Any]]) -> TrainConfig:
    """Apply dotted-path overrides, e.g. ``("il.mas.enabled", True)``."""
    for path, value in overrides:
        cfg = _set_path(cfg, path.split("."), value)
    return cfg


def _set_path(node, parts, value):
    name = parts[0]
    if not hasattr(node, name):
        raise KeyError(f"unknown config path segment {name!r} on {type(node).__name__}")
    if len(parts) == 1:
        current = getattr(node, name)
        value = _coerce(current, value)
        return dataclasses.replace(node, **{name: value})
    child = _set_path(getattr(node, name), parts[1:], value)
    return dataclasses.replace(node, **{name: child})


def _coerce(current, value):
    if isinstance(value, str):
        if isinstance(current, bool):
            return value.lower() in ("1", "true", "yes", "t")
        if isinstance(current, int) and not isinstance(current, bool):
            return int(value)
        if isinstance(current, float):
            return float(value)
        if isinstance(current, tuple):
            items = [v for v in value.replace(",", " ").split() if v]
            if current and isinstance(current[0], int):
                return tuple(int(v) for v in items)
            if current and isinstance(current[0], float):
                return tuple(float(v) for v in items)
            return tuple(items)
    if isinstance(value, list):
        return tuple(value)
    return value
