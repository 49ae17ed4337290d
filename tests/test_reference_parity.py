"""Cross-framework numerical parity — the ACTUAL reference code as oracle.

Every other test validates against independently transcribed numpy oracles;
a transcription can repeat the transcriber's misreading. This file imports
the reference's own torch modules from /root/reference (torch 2.x CPU) and
asserts our JAX implementations produce the same numbers on IDENTICAL
inputs and IDENTICAL weights:

  (a) ``FocalLoss.forward`` (/root/reference/retinanet/losses.py:253-452)
      vs ``ops.focal_loss.focal_loss`` across the IL-variant flag matrix,
      including the bg/fg split, bg_masks, and the documented
      pseudo-label ``*=``-on-copy no-op;
  (b) ``BBoxTransform``/``ClipBoxes`` (retinanet/utils.py:82-144) vs
      ``ops.boxes.decode_boxes``/``clip_boxes``;
  (c) the full reference ResNet-50 RetinaNet forward
      (retinanet/model.py:450-491) vs our flax model with ONE set of
      weights loaded both ways (models.convert.load_reference_checkpoint),
      plus end-to-end ``predict`` detections (model.py:494-605) vs
      ``ops.nms.detect_single``;
  (d) ``IL_Loss`` distillation terms (losses.py:515-739) vs
      ``il.losses.compute_losses`` with a frozen teacher, on shared
      precomputed model outputs (isolates the loss math from conv
      numerics).

The reference hardcodes ``device='cuda:0'``/``.cuda()`` in several tensor
constructions; the ``ref_cpu`` fixture patches ``torch.device`` and
``Tensor.cuda`` so the unmodified reference code runs on CPU torch.
torchvision is absent in this image; a pure-torch stub provides the two
functions the reference imports (``ops.nms``/``ops.batched_nms``).
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo absent"
)


# ---------------------------------------------------------------------------
# torchvision stub (pure torch NMS with torchvision semantics)

def _tv_nms(boxes, scores, iou_threshold):
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for oi in order.tolist():
        if suppressed[oi]:
            continue
        keep.append(oi)
        xx1 = torch.maximum(boxes[oi, 0], boxes[:, 0])
        yy1 = torch.maximum(boxes[oi, 1], boxes[:, 1])
        xx2 = torch.minimum(boxes[oi, 2], boxes[:, 2])
        yy2 = torch.minimum(boxes[oi, 3], boxes[:, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[oi] + areas - inter)
        suppressed |= iou > iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def _tv_batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.long)
    offs = idxs.to(boxes.dtype) * (boxes.max() + 1)
    return _tv_nms(boxes + offs[:, None], scores, iou_threshold)


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        # another test module may have installed an import-only dummy whose
        # nms returns zero keeps (test_reference_interop) — overwrite with
        # the functional NMS. The reference calls these as module
        # attributes (model.py:540, persuado_label.py:116), so patching
        # the module object reaches already-imported reference code too.
        sys.modules["torchvision"].ops.nms = _tv_nms
        sys.modules["torchvision"].ops.batched_nms = _tv_batched_nms
        sys.modules["torchvision.ops"] = sys.modules["torchvision"].ops
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.nms = _tv_nms
    ops.batched_nms = _tv_batched_nms
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def _install_reference_train_stubs():
    """train.train -> IL_Trainer pulls data/vis deps absent in this image
    (pycocotools, skimage) plus torchvision.transforms; stub ONLY the
    missing ones (cv2/matplotlib are real here and used by our own code)
    so the reference's training_iteration/change_beta import unmodified.
    None of the stubbed symbols are exercised: the trajectory tests drive
    the loss/optimizer path with a trainer stub, not the data layer."""
    tv = sys.modules["torchvision"]
    if not hasattr(tv, "transforms"):
        tr = types.ModuleType("torchvision.transforms")
        tr.Compose = lambda *a, **k: None
        tv.transforms = tr
        sys.modules["torchvision.transforms"] = tr
    for name, attrs in [
        ("pycocotools", {}),
        ("pycocotools.coco", {"COCO": object}),
        ("pycocotools.cocoeval", {"COCOeval": object}),
        ("skimage", {}),
        ("skimage.io", {}),
        ("skimage.transform", {}),
        ("skimage.color", {}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m


_install_torchvision_stub()
_install_reference_train_stubs()
sys.path.insert(0, REF)
try:
    from retinanet import losses as ref_losses
    from retinanet import model as ref_model
    from retinanet import utils as ref_utils
    from train import train as ref_train
finally:
    sys.path.remove(REF)


@pytest.fixture()
def ref_cpu(monkeypatch):
    """Run the unmodified reference code on CPU torch: route the hardcoded
    ``torch.device('cuda:0')`` constructions (losses.py:295,313,...) and
    bare ``.cuda()`` calls (losses.py:303-306,486-489) to CPU."""
    real_device = torch.device
    monkeypatch.setattr(torch, "device", lambda *a, **k: real_device("cpu"))
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    # training_iteration wraps its body in ``with torch.cuda.device(0)``
    # (train.py:23) — a no-op guard on CUDA rigs, a hard RuntimeError on
    # CPU-only torch
    import contextlib

    monkeypatch.setattr(torch.cuda, "device",
                        lambda *a, **k: contextlib.nullcontext())


class RefParams(dict):
    """Minimal stand-in for preprocessing.params.Params: dict of flags plus
    ``.states`` (params.py:124-178) — only what FocalLoss/IL_Loss read."""

    def __init__(self, states, **kw):
        base = dict(
            alpha=0.25, gamma=2.0,
            ignore_past_class=False, new_ignore_past_class=False,
            decrease_positive=1.0, decrease_positive_by_IOU=False,
            enhance_on_new=False, persuado_label=False, distill=False,
            distill_logits=True, prototype_loss=False, classifier_loss=False,
            bic=False, clip_loss=True, clip_cls_loss=0.03,
            clip_replay_cls_loss=0.003, enhance_error=False,
            enhance_error_method="L2", ignore_GD=False, warm_layers=[],
        )
        base.update(kw)
        super().__init__(base)
        self.states = states


def _toy_detection_inputs(seed, batch=3, num_classes=6, h=64, w=96,
                          empty_image=False, new_class_only=False):
    """Random (cls_prob, regression, anchors, gt_boxes, gt_labels, annots)
    on the (h, w) anchor grid; annots is the reference's (B, M, 5) -1-padded
    form of the same GT."""
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape

    rng = np.random.RandomState(seed)
    anchors = np.asarray(anchors_for_shape(h, w), np.float32)
    a = anchors.shape[0]
    cls_prob = rng.uniform(0.01, 0.99, (batch, a, num_classes)).astype(np.float32)
    regression = (rng.randn(batch, a, 4) * 0.5).astype(np.float32)

    max_boxes = 5
    gt_boxes = np.full((batch, max_boxes, 4), -1.0, np.float32)
    gt_labels = np.full((batch, max_boxes), -1, np.int64)
    lo = num_classes // 2 if new_class_only else 0
    for b in range(batch):
        if empty_image and b == 0:
            continue
        m = rng.randint(2, max_boxes + 1)
        for i in range(m):
            x1 = rng.uniform(0, w - 24)
            y1 = rng.uniform(0, h - 24)
            bw = rng.uniform(8, min(40, w - x1))
            bh = rng.uniform(8, min(40, h - y1))
            gt_boxes[b, i] = [x1, y1, x1 + bw, y1 + bh]
            gt_labels[b, i] = rng.randint(lo, num_classes)
    annots = np.concatenate(
        [gt_boxes, gt_labels[..., None].astype(np.float32)], axis=-1
    )
    return cls_prob, regression, anchors, gt_boxes, gt_labels, annots


# ===========================================================================
# (a) FocalLoss.forward parity
# ===========================================================================

FOCAL_VARIANTS = [
    # (name, cur_state, params overrides, ours focal kwargs)
    ("state0", 0, {}, {}),
    ("il_plain", 1, dict(distill=True), dict(incremental=True)),
    ("ignore_past", 1, dict(distill=True, ignore_past_class=True),
     dict(incremental=True, ignore_past_class=True)),
    ("new_ignore_past", 1,
     dict(distill=True, ignore_past_class=True, new_ignore_past_class=True),
     dict(incremental=True, ignore_past_class=True, new_ignore_past_class=True)),
    ("decrease_positive", 1, dict(distill=True, decrease_positive=0.9),
     dict(incremental=True, decrease_positive=0.9)),
    ("decrease_by_iou", 1, dict(distill=True, decrease_positive_by_IOU=True),
     dict(incremental=True, decrease_positive_by_iou=True)),
    ("enhance_on_new", 1, dict(distill=True, enhance_on_new=True),
     dict(incremental=True, enhance_on_new=True)),
]


def _run_reference_focal(cls_prob, regression, anchors, annots, cur_state,
                         params, progress=-1):
    fl = ref_losses.FocalLoss()
    out = fl.forward(
        torch.tensor(cls_prob), torch.tensor(regression),
        torch.tensor(anchors)[None], torch.tensor(annots),
        cur_state, params, progress,
    )
    bg, fg = out["cls_loss"]
    res = {
        "bg": bg.detach().numpy(),
        "fg": fg.detach().numpy(),
        "reg": out["reg_loss"].detach().numpy().mean(),
    }
    if "bg_masks" in out:
        res["bg_masks"] = out["bg_masks"].detach().numpy()
    if "enhance_on_new_loss" in out:
        res["enhance"] = float(out["enhance_on_new_loss"])
    return res


def _run_our_focal(cls_prob, regression, anchors, gt_boxes, gt_labels,
                   num_past, **kw):
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.focal_loss import focal_loss

    out = focal_loss(
        jnp.asarray(cls_prob), jnp.asarray(regression), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        num_past_class=num_past, **kw,
    )
    return out


@pytest.mark.parametrize(
    "name,cur_state,pkw,okw", FOCAL_VARIANTS, ids=[v[0] for v in FOCAL_VARIANTS]
)
def test_focal_loss_parity(ref_cpu, name, cur_state, pkw, okw):
    num_classes, num_past = 6, 3
    cls_prob, regression, anchors, gt_boxes, gt_labels, annots = (
        _toy_detection_inputs(seed=7, num_classes=num_classes)
    )
    states = [dict(num_past_class=0), dict(num_past_class=num_past)]
    params = RefParams(states, **pkw)

    ref = _run_reference_focal(
        cls_prob, regression, anchors, annots, cur_state, params
    )
    ours = _run_our_focal(
        cls_prob, regression, anchors, gt_boxes, gt_labels, num_past, **okw
    )

    np.testing.assert_allclose(np.asarray(ours.bg_loss), ref["bg"],
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.fg_loss), ref["fg"],
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(float(np.mean(np.asarray(ours.reg_loss))),
                               ref["reg"], rtol=2e-5, atol=1e-6)
    if "bg_masks" in ref:
        np.testing.assert_array_equal(np.asarray(ours.bg_mask), ref["bg_masks"])
    if "enhance" in ref:
        np.testing.assert_allclose(float(ours.enhance_on_new_loss),
                                   ref["enhance"], rtol=2e-5, atol=1e-6)


def test_focal_loss_parity_empty_gt_image(ref_cpu):
    """The empty-GT branch (losses.py:292-306): all-bg loss with (1-alpha)
    weighting, fg/reg zero. distill off — the reference skips empty images
    before appending bg_masks, so the mask batch would be ragged."""
    cls_prob, regression, anchors, gt_boxes, gt_labels, annots = (
        _toy_detection_inputs(seed=11, empty_image=True)
    )
    params = RefParams([dict(num_past_class=0)])
    ref = _run_reference_focal(cls_prob, regression, anchors, annots, 0, params)
    ours = _run_our_focal(cls_prob, regression, anchors, gt_boxes, gt_labels, 0)
    np.testing.assert_allclose(np.asarray(ours.bg_loss), ref["bg"],
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.fg_loss), ref["fg"],
                               rtol=2e-5, atol=1e-6)
    assert float(ours.fg_loss[0]) == 0.0 and float(ours.reg_loss[0]) == 0.0


def test_focal_loss_pseudo_label_noop_parity(ref_cpu):
    """The reference's pseudo-label FP discount (losses.py:387-393) chains
    advanced indexing with ``*=`` — it mutates a COPY, a silent no-op. Pin
    it: reference output with persuado_label+progress equals (1) reference
    without, and (2) ours WITHOUT the discount; ours WITH the intended
    discount (the documented divergence, ops/focal_loss.py) differs."""
    import jax.numpy as jnp

    num_classes, num_past = 6, 3
    cls_prob, regression, anchors, gt_boxes, gt_labels, annots = (
        _toy_detection_inputs(seed=13, num_classes=num_classes,
                              new_class_only=True)
    )
    states = [dict(num_past_class=0), dict(num_past_class=num_past)]
    on = RefParams(states, distill=True, persuado_label=True,
                   ignore_past_class=True)
    off = RefParams(states, distill=True, ignore_past_class=True)

    ref_on = _run_reference_focal(cls_prob, regression, anchors, annots, 1,
                                  on, progress=0.3)
    ref_off = _run_reference_focal(cls_prob, regression, anchors, annots, 1,
                                   off, progress=-1)
    np.testing.assert_allclose(ref_on["bg"], ref_off["bg"], rtol=1e-6)

    kw = dict(incremental=True, ignore_past_class=True)
    ours_off = _run_our_focal(cls_prob, regression, anchors, gt_boxes,
                              gt_labels, num_past, **kw)
    np.testing.assert_allclose(np.asarray(ours_off.bg_loss), ref_on["bg"],
                               rtol=2e-5, atol=1e-5)

    ours_on = _run_our_focal(cls_prob, regression, anchors, gt_boxes,
                             gt_labels, num_past,
                             pseudo_progress=jnp.asarray(0.3), **kw)
    assert not np.allclose(np.asarray(ours_on.bg_loss), ref_on["bg"],
                           rtol=1e-4), "intended discount must change bg loss"


# ===========================================================================
# (b) BBoxTransform / ClipBoxes parity
# ===========================================================================

def test_bbox_transform_parity(ref_cpu):
    from cl_object_detection_tpu.ops.boxes import decode_boxes

    rng = np.random.RandomState(3)
    anchors = np.abs(rng.randn(1, 500, 4)).astype(np.float32) * 50
    anchors[..., 2:] += anchors[..., :2] + 1.0
    deltas = (rng.randn(1, 500, 4) * 0.8).astype(np.float32)

    ref = ref_utils.BBoxTransform()(
        torch.tensor(anchors), torch.tensor(deltas)
    ).numpy()
    ours = np.asarray(decode_boxes(anchors[0], deltas[0]))
    np.testing.assert_allclose(ours, ref[0], rtol=1e-5, atol=1e-4)


def test_clip_boxes_parity(ref_cpu):
    from cl_object_detection_tpu.ops.boxes import clip_boxes

    rng = np.random.RandomState(4)
    h, w = 60, 90
    boxes = (rng.randn(1, 300, 4) * 60).astype(np.float32)
    img = torch.zeros((1, 3, h, w))
    ref = ref_utils.ClipBoxes()(torch.tensor(boxes.copy()), img).numpy()
    ours = np.asarray(clip_boxes(boxes[0], h, w))
    np.testing.assert_allclose(ours, ref[0], rtol=1e-6, atol=1e-6)


# ===========================================================================
# (c) Full-model forward + predict parity on shared weights
# ===========================================================================

NUM_CLASSES = 8
H, W = 64, 96


@pytest.fixture(scope="module")
def shared_models(tmp_path_factory):
    """One reference torch RetinaNet-R50 + our flax model carrying the SAME
    weights via models.convert.load_reference_checkpoint (the .pt interop
    path a reference user would use to switch frameworks)."""
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.models.convert import load_reference_checkpoint
    from cl_object_detection_tpu.models.retinanet import RetinaNet

    torch.manual_seed(0)
    tm = ref_model.create_retinanet(50, num_classes=NUM_CLASSES, pretrained=False)
    tm.eval()
    with torch.no_grad():
        # reference init zeroes head output weights (model.py:321-327) ->
        # constant logits; spread them (mildly — the random trunk features
        # are large, so tiny weight stds already give full score spread)
        torch.manual_seed(1)
        tm.classificationModel.output.weight.normal_(0.0, 2e-5)
        tm.classificationModel.output.bias.normal_(-3.6, 0.5)
        tm.regressionModel.output.weight.normal_(0.0, 1e-5)
        tm.regressionModel.output.bias.normal_(0.0, 0.05)

    path = str(tmp_path_factory.mktemp("parity") / "ref.pt")
    torch.save(tm.state_dict(), path)

    jm = RetinaNet(depth=50, num_classes=NUM_CLASSES, dtype=jnp.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    variables = load_reference_checkpoint(variables, path, strict=True)

    rng = np.random.RandomState(5)
    # both frameworks consume pre-normalized images (reference Normalizer
    # runs in the data pipeline; our float path passes through untouched)
    images = rng.randn(2, H, W, 3).astype(np.float32) * 0.8
    return tm, jm, variables, images


def test_model_forward_parity(shared_models):
    import jax.numpy as jnp

    tm, jm, variables, images = shared_models
    timg = torch.tensor(images.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t_cls, t_reg, t_feats, t_anchors = tm(
            timg, return_feat=True, return_anchor=True, enable_act=False
        )

    j_cls, j_reg, j_feats = jm.apply(
        variables, jnp.asarray(images), False, method=RetinaNetForwardAll
    )

    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_reg), t_reg.numpy(),
                               rtol=1e-3, atol=2e-3)
    for jf, tf in zip(j_feats, t_feats):
        np.testing.assert_allclose(
            np.asarray(jf), tf.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=2e-3,
        )

    from cl_object_detection_tpu.ops.anchors import anchors_for_shape

    np.testing.assert_allclose(np.asarray(anchors_for_shape(H, W)),
                               t_anchors[0].numpy(), rtol=1e-5, atol=1e-3)


def RetinaNetForwardAll(module, images, enable_act):
    return module.forward_all(images, enable_act)


def test_predict_detections_parity(shared_models, ref_cpu):
    """End-to-end detections: reference ``predict`` (sigmoid -> decode ->
    clip -> >0.05 -> class-aware NMS 0.5, model.py:494-550) vs our fused
    detect_single, same weights, same image."""
    import jax.numpy as jnp

    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_single

    tm, jm, variables, images = shared_models
    img = images[:1]
    timg = torch.tensor(img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        scores_t, labels_t, boxes_t = tm.predict(timg)
    ref_dets = sorted(
        zip(scores_t.numpy().tolist(), labels_t.numpy().tolist(),
            boxes_t.numpy().tolist()),
        key=lambda r: -r[0],
    )

    logits, regression = jm.apply(variables, jnp.asarray(img), False)
    anchors = jnp.asarray(anchors_for_shape(H, W))
    det = detect_single(
        logits[0], regression[0], anchors, height=H, width=W,
        score_thresh=0.05, iou_thresh=0.5,
        pre_nms_topk=anchors.shape[0], max_detections=300,
        nms_impl="iterative", scores_are_logits=True,
    )
    valid = np.asarray(det.valid)
    ours = sorted(
        zip(np.asarray(det.scores)[valid].tolist(),
            np.asarray(det.labels)[valid].tolist(),
            np.asarray(det.boxes)[valid].tolist()),
        key=lambda r: -r[0],
    )

    # compare the score>0.1 subsets: NMS suppression only flows from higher
    # score to lower, so this subset is self-contained and immune to
    # candidates flipping across the 0.05 threshold by conv-numerics noise
    ours = [r for r in ours if r[0] > 0.1]
    ref_dets = [r for r in ref_dets if r[0] > 0.1]
    assert len(ref_dets) >= 10, "degenerate test: too few confident detections"
    assert len(ours) == len(ref_dets), (
        f"detection count mismatch: ours {len(ours)} vs ref {len(ref_dets)}"
    )
    for (os_, ol, ob), (rs, rl, rb) in zip(ours, ref_dets):
        assert ol == rl
        np.testing.assert_allclose(os_, rs, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(ob, rb, rtol=1e-3, atol=5e-2)


# ===========================================================================
# (d) IL_Loss distillation-term parity (shared precomputed outputs)
# ===========================================================================

class _Namespace:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class FakeTorchModel:
    """Stands in for the reference composite model inside IL_Loss.forward:
    returns precomputed outputs for any input (the same arrays our side
    sees), so the comparison isolates the LOSS math."""

    def __init__(self, cls_logits, regression, feats_nchw, anchors,
                 output_weight=None, num_classes=None):
        self.cls = torch.tensor(cls_logits)
        self.reg = torch.tensor(regression)
        self.feats = [torch.tensor(f) for f in feats_nchw]
        self.anchors = torch.tensor(anchors)[None]
        self.num_classes = num_classes
        if output_weight is not None:
            self.classificationModel = _Namespace(
                output=_Namespace(
                    weight=_Namespace(data=torch.tensor(output_weight))
                ),
                num_anchors=9,
            )

    def __call__(self, img, return_feat=False, return_anchor=True,
                 enable_act=False):
        cls = torch.sigmoid(self.cls) if enable_act else self.cls
        out = [cls, self.reg]
        if return_feat:
            out.append(self.feats)
        if return_anchor:
            out.append(self.anchors)
        return tuple(out)


def _distill_setup(seed, num_classes=6, num_past=3, batch=2, h=64, w=96,
                   cin=32):
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape, feature_shapes

    rng = np.random.RandomState(seed)
    anchors = np.asarray(anchors_for_shape(h, w), np.float32)
    a = anchors.shape[0]
    s_cls = rng.randn(batch, a, num_classes).astype(np.float32) - 2.0
    s_reg = (rng.randn(batch, a, 4) * 0.4).astype(np.float32)
    t_cls = rng.randn(batch, a, num_past).astype(np.float32) - 2.0
    t_reg = (rng.randn(batch, a, 4) * 0.4).astype(np.float32)
    shapes = feature_shapes(h, w)
    s_feats = [rng.randn(batch, fh, fw, 16).astype(np.float32)
               for fh, fw in shapes]
    t_feats = [rng.randn(batch, fh, fw, 16).astype(np.float32)
               for fh, fw in shapes]
    # anchor-major classifier weights: row a*C + c (model.py:196-200)
    w_new = rng.randn(9 * num_classes, cin, 3, 3).astype(np.float32)
    w_old = rng.randn(9 * num_past, cin, 3, 3).astype(np.float32)

    _, _, _, gt_boxes, gt_labels, annots = _toy_detection_inputs(
        seed + 1, batch=batch, num_classes=num_classes, h=h, w=w,
        new_class_only=True,
    )
    return dict(anchors=anchors, s_cls=s_cls, s_reg=s_reg, t_cls=t_cls,
                t_reg=t_reg, s_feats=s_feats, t_feats=t_feats, w_new=w_new,
                w_old=w_old, gt_boxes=gt_boxes, gt_labels=gt_labels,
                annots=annots, num_classes=num_classes, num_past=num_past)


def _run_reference_il_loss(d, *, distill_logits, classifier_loss, ignore_gd):
    states = [dict(num_past_class=0), dict(num_past_class=d["num_past"])]
    params = RefParams(
        states, distill=True, distill_logits=distill_logits,
        classifier_loss=classifier_loss, ignore_GD=ignore_gd,
        ignore_past_class=True,
    )
    model = FakeTorchModel(
        d["s_cls"], d["s_reg"],
        [f.transpose(0, 3, 1, 2) for f in d["s_feats"]], d["anchors"],
        output_weight=d["w_new"], num_classes=d["num_classes"],
    )
    prev = FakeTorchModel(
        d["t_cls"], d["t_reg"],
        [f.transpose(0, 3, 1, 2) for f in d["t_feats"]], d["anchors"],
        output_weight=d["w_old"], num_classes=d["num_past"],
    )
    trainer = _Namespace(
        model=model, prev_model=prev, params=params, cur_state=1,
        cur_warm_stage=-1, cur_epoch=1, end_epoch=10, bic=None,
    )
    il = ref_losses.IL_Loss(trainer)
    out = il.forward(torch.zeros(1), torch.tensor(d["annots"]))
    return {k: float(v) for k, v in out.items()}


def _run_our_il_loss(d, *, distill_logits, classifier_loss, ignore_gd):
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import FocalConfig, ILConfig
    from cl_object_detection_tpu.il.losses import (
        LossStatics, classifier_vectors_jnp, compute_losses,
    )

    def student_apply(v, img, act):
        cls = jnp.asarray(d["s_cls"])
        if act:
            cls = 1.0 / (1.0 + jnp.exp(-cls))
        return cls, jnp.asarray(d["s_reg"]), [jnp.asarray(f) for f in d["s_feats"]]

    def teacher_apply(v, img, act):
        cls = jnp.asarray(d["t_cls"])
        if act:
            cls = 1.0 / (1.0 + jnp.exp(-cls))
        return cls, jnp.asarray(d["t_reg"]), [jnp.asarray(f) for f in d["t_feats"]]

    # flax kernel (kh, kw, cin, out) from the torch weights (out, cin, kh, kw)
    kern_new = jnp.asarray(d["w_new"].transpose(2, 3, 1, 0))
    kern_old = jnp.asarray(d["w_old"].transpose(2, 3, 1, 0))
    variables = {"params": {"classification_head": {"output": {"kernel": kern_new}}}}
    teacher_vecs = classifier_vectors_jnp(
        {"classification_head": {"output": {"kernel": kern_old}}}
    )

    il_cfg = ILConfig(ignore_past_class=True, ignore_gd=ignore_gd,
                      classifier_loss=classifier_loss)
    statics = LossStatics(
        num_classes=d["num_classes"], num_past_class=d["num_past"],
        incremental=True, use_distill=True, distill_logits=distill_logits,
        use_classifier_loss=classifier_loss, ignore_gd=ignore_gd,
    )
    total, metrics = compute_losses(
        None, student_apply, variables, jnp.zeros(1),
        jnp.asarray(d["gt_boxes"]), jnp.asarray(d["gt_labels"]),
        jnp.asarray(d["anchors"]), il_cfg, FocalConfig(), statics,
        teacher_apply_with_feats=teacher_apply, teacher_variables={},
        classifier_vectors=teacher_vecs if classifier_loss else None,
    )
    return {k: float(v) for k, v in metrics.items()}


@pytest.mark.parametrize(
    "distill_logits,classifier_loss,ignore_gd",
    [(True, False, False), (False, False, False),
     (True, True, False), (True, False, True)],
    ids=["logits", "probs", "classifier_loss", "ignore_GD"],
)
def test_il_distill_parity(ref_cpu, distill_logits, classifier_loss, ignore_gd):
    d = _distill_setup(21)
    ref = _run_reference_il_loss(
        d, distill_logits=distill_logits, classifier_loss=classifier_loss,
        ignore_gd=ignore_gd,
    )
    ours = _run_our_il_loss(
        d, distill_logits=distill_logits, classifier_loss=classifier_loss,
        ignore_gd=ignore_gd,
    )
    keys = ["cls_bg_loss", "cls_fg_loss", "reg_loss",
            "dist_cls_loss", "dist_reg_loss", "dist_feat_loss"]
    if classifier_loss:
        keys.append("sim_loss")
    for k in keys:
        assert k in ref and k in ours, k
        np.testing.assert_allclose(ours[k], ref[k], rtol=5e-5, atol=1e-6,
                                   err_msg=k)
    assert ref["dist_reg_loss"] > 0 and ref["dist_cls_loss"] > 0


def test_il_replay_path_parity(ref_cpu):
    """Plain/replay path (losses.py:556-603): clip_replay_cls_loss fg-mean
    and the enhance_error L2 penalty on new-class scores."""
    d = _distill_setup(23)
    states = [dict(num_past_class=0), dict(num_past_class=d["num_past"])]
    params = RefParams(states, enhance_error=True, enhance_error_method="L2",
                       clip_loss=True)
    model = FakeTorchModel(
        d["s_cls"], d["s_reg"],
        [f.transpose(0, 3, 1, 2) for f in d["s_feats"]], d["anchors"],
    )
    trainer = _Namespace(model=model, prev_model=None, params=params,
                         cur_state=1, cur_warm_stage=-1, cur_epoch=1,
                         end_epoch=10, bic=None)
    il = ref_losses.IL_Loss(trainer)
    ref = {k: float(v) for k, v in
           il.forward(torch.zeros(1), torch.tensor(d["annots"]),
                      is_replay=True).items()}

    import jax.numpy as jnp

    from cl_object_detection_tpu.config import FocalConfig, ILConfig
    from cl_object_detection_tpu.il.losses import LossStatics, compute_losses

    def student_apply(v, img, act):
        cls = jnp.asarray(d["s_cls"])
        if act:
            cls = 1.0 / (1.0 + jnp.exp(-cls))
        return cls, jnp.asarray(d["s_reg"])

    statics = LossStatics(
        num_classes=d["num_classes"], num_past_class=d["num_past"],
        incremental=False, is_replay=True, use_enhance_error=True,
        enhance_error_method="L2",
    )
    _, ours = compute_losses(
        student_apply, None, {}, jnp.zeros(1),
        jnp.asarray(d["gt_boxes"]), jnp.asarray(d["gt_labels"]),
        jnp.asarray(d["anchors"]), ILConfig(), FocalConfig(), statics,
    )
    for k in ["cls_bg_loss", "cls_fg_loss", "reg_loss", "enhance_loss"]:
        assert k in ref, k
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=5e-5,
                                   atol=1e-6, err_msg=k)


# ===========================================================================
# (e) full train-step parity: same weights + same batches -> backward +
#     grad-accumulate + clip + Adam in BOTH frameworks (reference iteration
#     semantics at /root/reference/train/train.py:15-80, optimizer groups at
#     main.py:57-59) — the training-TRAJECTORY layer of the parity stack.
# ===========================================================================

TS_CLASSES = 6
TS_LR = 1e-5
TS_EVERY = 2


def _ts_batch(seed):
    rng = np.random.RandomState(seed)
    images = rng.randn(2, H, W, 3).astype(np.float32) * 0.8
    boxes = np.full((2, 5, 4), -1.0, np.float32)
    labels = np.full((2, 5), -1, np.int64)
    for b in range(2):
        for i in range(rng.randint(1, 4)):
            x1, y1 = rng.uniform(0, W - 30), rng.uniform(0, H - 30)
            bw, bh = rng.uniform(10, 28), rng.uniform(10, 28)
            boxes[b, i] = [x1, y1, x1 + bw, y1 + bh]
            labels[b, i] = rng.randint(0, TS_CLASSES)
    annots = np.concatenate([boxes, labels[..., None].astype(np.float32)], -1)
    return images, boxes, labels, annots


@pytest.fixture(scope="module")
def train_step_models(tmp_path_factory):
    """R18 pair with ONE weight set (convert interop path), mildly spread
    head outputs so gradients are non-degenerate."""
    import jax
    import jax.numpy as jnp

    # torch.optim lazily imports _dynamo, whose `str | torch.device`
    # annotations explode under ref_cpu's torch.device monkeypatch —
    # import it while torch.device is still real
    import torch._dynamo  # noqa: F401

    from cl_object_detection_tpu.models.convert import load_reference_checkpoint
    from cl_object_detection_tpu.models.retinanet import RetinaNet

    torch.manual_seed(0)
    tm = ref_model.create_retinanet(18, num_classes=TS_CLASSES, pretrained=False)
    with torch.no_grad():
        torch.manual_seed(1)
        tm.classificationModel.output.weight.normal_(0.0, 2e-5)
        tm.classificationModel.output.bias.normal_(-3.6, 0.5)
        tm.regressionModel.output.weight.normal_(0.0, 1e-5)
        tm.regressionModel.output.bias.normal_(0.0, 0.05)
    path = str(tmp_path_factory.mktemp("ts_parity") / "ref18.pt")
    torch.save(tm.state_dict(), path)

    jm = RetinaNet(depth=18, num_classes=TS_CLASSES, dtype=jnp.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    variables = load_reference_checkpoint(variables, path, strict=True)
    return tm, jm, variables


def _torch_tensors_as_tree(named_tensors, params_template):
    """{torch param name -> tensor} dict -> our flax params tree, with the
    same OIHW->HWIO transposition the checkpoint converter applies."""
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.models.convert import _map_full_key

    tree = jax.tree.map(lambda x: None, params_template)
    filled = 0
    for name, t in named_tensors.items():
        path_parts, pname, collection = _map_full_key(name)
        if collection != "params":
            continue
        g = t.detach().numpy()
        if g.ndim == 4:
            g = g.transpose(2, 3, 1, 0)
        node = tree
        for part in path_parts:
            node = node[part]
        assert node[pname] is None, f"double-filled {name}"
        node[pname] = jnp.asarray(g)
        filled += 1
    # tree_leaves drops surviving None leaves, so a count mismatch catches
    # any our-side param the torch model didn't cover
    expected = len(jax.tree_util.tree_leaves(params_template))
    got = len(jax.tree_util.tree_leaves(tree))
    assert got == expected == filled, (got, expected, filled)
    return tree


def _run_reference_train_step(tm, batches):
    """The reference's exact iteration semantics on the plain (state-0)
    path: per micro-batch loss = mean(bg)+mean(fg)+mean(reg) scaled by
    1/every_iter, accumulate backward, then clip 0.1 -> Adam step
    (train.py:48-72; two Adam groups, main.py:57-59).

    Works on a COPY: opt.step() must not mutate the module-scoped
    fixture's model out from under later tests."""
    import copy

    tm = copy.deepcopy(tm)
    # two Adam groups, main.py:57-59: group 1 = everything except the
    # classifier output (WHITE_LIST_FOR_OPTIM + get_parameters,
    # il_trainer.py:29-43 — importing il_trainer pulls pycocotools, absent
    # here, so the 4-line filter is inlined), group 2 = the output conv
    white_list = ["classificationModel.output"]
    group1 = [p for n, p in tm.named_parameters()
              if not any(w in n for w in white_list)]
    tm.train()
    tm.freeze_bn()
    opt = torch.optim.Adam(
        [{"params": group1},
         {"params": tm.classificationModel.output.parameters()}],
        lr=TS_LR,
    )
    opt.zero_grad(set_to_none=True)
    states = [dict(num_past_class=0)]
    params = RefParams(states)
    losses, micro_grads = [], []
    for images, annots in batches:
        timg = torch.tensor(images.transpose(0, 3, 1, 2))
        cls, reg, anchors_t = tm(timg, return_feat=False, return_anchor=True,
                                 enable_act=True)
        out = ref_losses.FocalLoss()(cls, reg, anchors_t,
                                     torch.tensor(annots), 0, params)
        bg, fg = out["cls_loss"]
        loss = bg.mean() + fg.mean() + out["reg_loss"].mean()
        losses.append(float(loss.detach()))
        (loss / TS_EVERY).backward()
        micro_grads.append({n: p.grad.detach().clone()
                            for n, p in tm.named_parameters()})
    acc_grads = {n: p.grad.detach().clone() for n, p in tm.named_parameters()}
    total_norm = float(torch.nn.utils.clip_grad_norm_(tm.parameters(), 0.1))
    opt.step()
    new_params = {n: p.detach().clone() for n, p in tm.named_parameters()}
    return losses, micro_grads, acc_grads, total_norm, new_params


def test_train_step_parity(train_step_models, ref_cpu):
    """Same weights + same two micro-batches -> the gradient, the clip
    coefficient, and the Adam-updated parameters agree across frameworks.

    Decomposed into (1) loss parity, (2) per-tensor gradient parity at
    conv-numerics tolerance, (3) optimizer exactness: the reference's own
    accumulated gradient pushed through OUR clip+Adam reproduces torch's
    updated params to ~1e-8, and (4) end-to-end param agreement after our
    full jitted accumulate->clip->Adam step."""
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import (
        StepStatics,
        _clip_by_global_norm,
        make_train_step,
    )

    tm, jm, variables = train_step_models
    bA, bB = _ts_batch(31), _ts_batch(32)

    ref_losses_v, ref_micro, ref_acc, ref_norm, ref_new = (
        _run_reference_train_step(tm, [(bA[0], bA[3]), (bB[0], bB[3])])
    )

    # ---- ours: the real jitted step, every_iter=2 (trainer wiring:
    # make_optimizer(use_clip=False) + StepStatics clip, trainer.py:262)
    sched = ScheduleConfig(lr=TS_LR, every_iter=TS_EVERY)
    tx = make_optimizer(sched, variables["params"], use_clip=False)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    params0 = jax.tree.map(np.asarray, state.params)
    anchors = jnp.asarray(anchors_for_shape(H, W))
    step = make_train_step(
        jm, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=TS_CLASSES),
        StepStatics(every_iter=TS_EVERY, use_clip=True, grad_clip=0.1),
        donate=False,
    )
    state1, mA = step(state, jnp.asarray(bA[0]), jnp.asarray(bA[1]),
                      jnp.asarray(bA[2]))
    our_acc_half = jax.tree.map(lambda g: np.asarray(g) / TS_EVERY,
                                state1.grad_acc)  # == torch grad after bwd A
    state2, mB = step(state1, jnp.asarray(bB[0]), jnp.asarray(bB[1]),
                      jnp.asarray(bB[2]))

    # (1) loss parity per micro-batch
    for m, ref_l in zip([mA, mB], ref_losses_v):
        ours_l = float(m["cls_bg_loss"] + m["cls_fg_loss"] + m["reg_loss"])
        np.testing.assert_allclose(ours_l, ref_l, rtol=2e-3, atol=1e-4)

    from cl_object_detection_tpu.models.convert import _map_full_key

    # (2) per-tensor gradient parity (micro-batch A): cosine + norm ratio
    # at conv-backward numerics tolerance
    for name, tg in ref_micro[0].items():
        path_parts, pname, collection = _map_full_key(name)
        if collection != "params":
            continue
        node = our_acc_half
        for part in path_parts:
            node = node[part]
        og = np.asarray(node[pname], np.float64).reshape(-1)
        rg = tg.numpy().astype(np.float64)
        if rg.ndim == 4:
            rg = rg.transpose(2, 3, 1, 0)
        rg = rg.reshape(-1)
        rn, on = np.linalg.norm(rg), np.linalg.norm(og)
        if rn < 1e-12 and on < 1e-12:
            continue
        cos = float(og @ rg / max(on * rn, 1e-30))
        assert cos > 0.999, f"{name}: grad cosine {cos}"
        assert abs(on / rn - 1.0) < 5e-3, f"{name}: norm ratio {on / rn}"

    # (3) optimizer exactness: torch's OWN pre-clip accumulated gradient
    # through OUR clip + Adam == torch's updated params, elementwise
    # (isolates clip+optimizer semantics from conv numerics)
    ref_g_tree = _torch_tensors_as_tree(ref_acc, state.params)
    g = _clip_by_global_norm(ref_g_tree, 0.1)
    updates, _ = state.tx.update(g, state.opt_state, state.params)
    ours_new = jax.tree.map(jnp.add, state.params, updates)

    checked = 0
    for name, rp in ref_new.items():
        path_parts, pname, collection = _map_full_key(name)
        if collection != "params":
            continue
        node_new, node_old = ours_new, params0
        for part in path_parts:
            node_new, node_old = node_new[part], node_old[part]
        ours_delta = np.asarray(node_new[pname]) - node_old[pname]
        rp = rp.numpy()
        if rp.ndim == 4:
            rp = rp.transpose(2, 3, 1, 0)
        ref_delta = rp - node_old[pname]
        np.testing.assert_allclose(ours_delta, ref_delta, rtol=0, atol=5e-8,
                                   err_msg=f"adam update mismatch: {name}")
        checked += 1
    assert checked > 50

    # mapping completeness + clip input: the mapped tree's global norm IS
    # the norm torch's clip_grad_norm_ saw
    mapped_norm = float(np.sqrt(sum(
        float(np.sum(np.square(np.asarray(l))))
        for l in jax.tree.leaves(ref_g_tree)
    )))
    np.testing.assert_allclose(mapped_norm, ref_norm, rtol=1e-5)

    # (4) end-to-end: our fully-jitted 2-micro-step state vs torch params.
    # Single-step Adam updates are bounded by lr, and elements whose
    # gradient is at the conv-noise floor can flip the update sign, so the
    # elementwise bound is 2*lr + slack; the overwhelming majority must
    # agree far tighter.
    diffs = []
    for name, rp in ref_new.items():
        path_parts, pname, collection = _map_full_key(name)
        if collection != "params":
            continue
        node = state2.params
        for part in path_parts:
            node = node[part]
        rp = rp.numpy()
        if rp.ndim == 4:
            rp = rp.transpose(2, 3, 1, 0)
        diffs.append((np.abs(np.asarray(node[pname]) - rp)).reshape(-1))
    diffs = np.concatenate(diffs)
    assert diffs.max() <= 2.0 * TS_LR + 1e-7, float(diffs.max())
    agree = float(np.mean(diffs < 1e-6))
    assert agree > 0.99, f"only {agree:.4%} of params agree to 1e-6"


def test_training_trajectory_equivalence(train_step_models, ref_cpu):
    """24 micro-steps (12 Adam steps at every_iter=2) from shared init on a
    fixed 6-batch cycle: the two frameworks' loss curves must track each
    other — the strongest obtainable stand-in for BASELINE's 'mAP within
    0.3 of the reference' on a rig with no VOC2007 (reference loop
    semantics at /root/reference/train/train.py:15-80)."""
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import StepStatics, make_train_step

    tm, jm, variables = train_step_models
    lr, n_micro = 1e-4, 24
    batches = [_ts_batch(100 + i) for i in range(6)]

    # ---- reference trajectory (same semantics as _run_reference_train_step,
    # looped; lr raised so the curve moves measurably in 24 steps)
    import copy

    tm = copy.deepcopy(tm)  # don't mutate the module-scoped fixture's model
    white_list = ["classificationModel.output"]
    group1 = [p for n, p in tm.named_parameters()
              if not any(w in n for w in white_list)]
    tm.train()
    tm.freeze_bn()
    opt = torch.optim.Adam(
        [{"params": group1},
         {"params": tm.classificationModel.output.parameters()}], lr=lr)
    opt.zero_grad(set_to_none=True)
    params = RefParams([dict(num_past_class=0)])
    ref_curve = []
    for it in range(n_micro):
        images, _, _, annots = batches[it % len(batches)]
        timg = torch.tensor(images.transpose(0, 3, 1, 2))
        cls, reg, anchors_t = tm(timg, return_feat=False, return_anchor=True,
                                 enable_act=True)
        out = ref_losses.FocalLoss()(cls, reg, anchors_t,
                                     torch.tensor(annots), 0, params)
        bg, fg = out["cls_loss"]
        loss = bg.mean() + fg.mean() + out["reg_loss"].mean()
        ref_curve.append(float(loss.detach()))
        (loss / TS_EVERY).backward()
        if (it + 1) % TS_EVERY == 0:
            torch.nn.utils.clip_grad_norm_(tm.parameters(), 0.1)
            opt.step()
            opt.zero_grad(set_to_none=True)

    # ---- our trajectory (the real jitted step)
    sched = ScheduleConfig(lr=lr, every_iter=TS_EVERY)
    tx = make_optimizer(sched, variables["params"], use_clip=False)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    anchors = jnp.asarray(anchors_for_shape(H, W))
    step = make_train_step(
        jm, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=TS_CLASSES),
        StepStatics(every_iter=TS_EVERY, use_clip=True, grad_clip=0.1),
        donate=False,
    )
    our_curve = []
    for it in range(n_micro):
        images, boxes, labels, _ = batches[it % len(batches)]
        state, m = step(state, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(labels))
        our_curve.append(
            float(m["cls_bg_loss"] + m["cls_fg_loss"] + m["reg_loss"]))

    # the curves track: small pointwise deviation even as numerics noise
    # compounds through 12 optimizer steps, and both actually train
    for it, (o, r) in enumerate(zip(our_curve, ref_curve)):
        assert abs(o - r) / max(abs(r), 1e-6) < 0.02, (
            f"step {it}: ours {o:.5f} vs ref {r:.5f}"
        )
    ref_drop = ref_curve[0] - min(ref_curve)
    assert ref_drop > 0.01, "degenerate: reference curve never moved"


# ===========================================================================
# (f) INCREMENTAL trajectory parity — the state-1 hot path: frozen teacher +
#     feature/cls/reg distillation + replay interleave with the Adam-beta1
#     swap + clip semantics, both frameworks stepped from shared weights
#     (reference semantics: train.py:15-80 training_iteration,
#     train.py:133-150 change_beta, losses.py:605-737 IL_Loss incremental
#     branch). This is the layer the per-function distill parity tests
#     cannot cover: small per-step numeric deltas COMPOUND through the
#     optimizer across mixed batch kinds.
# ===========================================================================

IT_PAST, IT_NEW = 3, 3          # 3 old + 3 new = 6 knowing classes
IT_LR, IT_EVERY = 1e-4, 2
IT_BETA_REPLAY = 0.5            # visible effect if the swap ever diverges


def _ts_batch_classes(seed, lo, hi):
    """_ts_batch with GT labels drawn from [lo, hi) — new-class batches
    use [IT_PAST, IT_PAST+IT_NEW), replay batches [0, IT_PAST). Boxes are
    28-56 px so the 32-51 px P3 anchors actually assign positives
    (IoU > 0.5) and the fg/reg/clip_loss paths fire in-trajectory."""
    rng = np.random.RandomState(seed)
    images = rng.randn(2, H, W, 3).astype(np.float32) * 0.8
    boxes = np.full((2, 5, 4), -1.0, np.float32)
    labels = np.full((2, 5), -1, np.int64)
    for b in range(2):
        for i in range(rng.randint(1, 4)):
            x1, y1 = rng.uniform(0, W - 58), rng.uniform(0, H - 58)
            bw, bh = rng.uniform(28, 56), rng.uniform(28, 56)
            boxes[b, i] = [x1, y1, x1 + bw, y1 + bh]
            labels[b, i] = rng.randint(lo, hi)
    annots = np.concatenate([boxes, labels[..., None].astype(np.float32)], -1)
    return images, boxes, labels, annots


@pytest.fixture(scope="module")
def il_trajectory_models(tmp_path_factory):
    """R18 student (6 classes) + frozen R18 teacher (3 classes), each with
    ONE weight set converted into both frameworks. The teacher's output
    bias is spread around sigmoid≈0.08 so its fg mask (p > 0.05,
    losses.py:712-718) is non-degenerate — a prior-initialized teacher
    would predict no foreground and zero out every distill term."""
    import jax
    import jax.numpy as jnp

    import torch._dynamo  # noqa: F401  (see train_step_models)

    from cl_object_detection_tpu.models.convert import load_reference_checkpoint
    from cl_object_detection_tpu.models.retinanet import RetinaNet

    tmp = tmp_path_factory.mktemp("il_traj")

    torch.manual_seed(20)
    tt = ref_model.create_retinanet(18, num_classes=IT_PAST, pretrained=False)
    with torch.no_grad():
        torch.manual_seed(21)
        tt.classificationModel.output.weight.normal_(0.0, 2e-5)
        tt.classificationModel.output.bias.normal_(-2.4, 0.4)
        tt.regressionModel.output.weight.normal_(0.0, 1e-5)
        tt.regressionModel.output.bias.normal_(0.0, 0.05)
    tpath = str(tmp / "teacher18.pt")
    torch.save(tt.state_dict(), tpath)

    torch.manual_seed(22)
    tm = ref_model.create_retinanet(18, num_classes=IT_PAST + IT_NEW,
                                    pretrained=False)
    with torch.no_grad():
        torch.manual_seed(23)
        tm.classificationModel.output.weight.normal_(0.0, 2e-5)
        tm.classificationModel.output.bias.normal_(-3.6, 0.5)
        tm.regressionModel.output.weight.normal_(0.0, 1e-5)
        tm.regressionModel.output.bias.normal_(0.0, 0.05)
    spath = str(tmp / "student18.pt")
    torch.save(tm.state_dict(), spath)

    jt = RetinaNet(depth=18, num_classes=IT_PAST, dtype=jnp.float32)
    tvars = jt.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    tvars = load_reference_checkpoint(tvars, tpath, strict=True)
    jm = RetinaNet(depth=18, num_classes=IT_PAST + IT_NEW, dtype=jnp.float32)
    svars = jm.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)))
    svars = load_reference_checkpoint(svars, spath, strict=True)
    return tm, tt, jm, jt, svars, tvars


class _RefTrainerStub:
    """The il_trainer surface IL_Loss/training_iteration/change_beta read
    (train.py:15-80, 133-150; il_trainer.py:91-100)."""

    def __init__(self, model, prev_model, params, optimizer):
        self.model = model
        self.prev_model = prev_model
        self.params = params
        self.optimizer = optimizer
        self.cur_state = 1
        self.cur_warm_stage = -1
        self.cur_epoch = 1
        self.end_epoch = 10
        self.bic = None
        self.backward_count = 0
        import collections

        self.loss_hist = collections.deque(maxlen=500)

    def is_backward(self):
        return self.backward_count == 0

    def backward_next(self):
        self.backward_count = (self.backward_count + 1) % self.params[
            "every_iter"]


def test_incremental_trajectory_equivalence(il_trajectory_models, ref_cpu):
    """24 micro-steps (12 Adam steps at every_iter=2) of the STATE-1 path
    from shared init, new-class and replay batches interleaved in a
    schedule covering every accumulation-window kind combination
    ([new,new], [new,replay], [replay,new], [replay,replay]): the two
    frameworks' total-loss curves must track each other pointwise. This
    composes focal + clip_loss + feature/cls/reg distillation (frozen
    teacher) + enhance_error + the beta1 swap + grad-accumulate + clip +
    two-group Adam — the reference's full incremental hot path."""
    import copy

    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer, set_beta1
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import StepStatics, make_train_step

    tm, tt, jm, jt, svars, tvars = il_trajectory_models
    n_micro = 24
    # every accumulation window kind-pair: FF, FR, RF, RR (F=new batch,
    # R=replay batch), cycled 3x
    kinds = ([False, False, False, True, True, False, True, True] * 3)
    new_batches = [_ts_batch_classes(200 + i, IT_PAST, IT_PAST + IT_NEW)
                   for i in range(4)]
    rep_batches = [_ts_batch_classes(300 + i, 0, IT_PAST) for i in range(4)]

    def batch_for(it):
        src = rep_batches if kinds[it] else new_batches
        return src[it % len(src)]

    # ---- reference trajectory: training_iteration + change_beta verbatim
    # semantics (train.py:15-80); distill on probabilities + enhance_error
    # on replay, clip_loss both paths (RefParams defaults = main.py flags)
    tm = copy.deepcopy(tm)
    tt_r = copy.deepcopy(tt)
    states = [dict(num_past_class=0, num_knowing_class=IT_PAST),
              dict(num_past_class=IT_PAST,
                   num_knowing_class=IT_PAST + IT_NEW)]
    params = RefParams(
        states, distill=True, distill_logits=False, enhance_error=True,
        enhance_error_method="L2", clip_loss=True,
        every_iter=IT_EVERY, beta_on_replay=IT_BETA_REPLAY,
        beta_on_where="all", mas=False, agem=False, no_clip=False,
    )
    white_list = ["classificationModel.output"]
    group1 = [p for n, p in tm.named_parameters()
              if not any(w in n for w in white_list)]
    tm.train()
    tm.freeze_bn()
    opt = torch.optim.Adam(
        [{"params": group1},
         {"params": tm.classificationModel.output.parameters()}], lr=IT_LR)
    opt.zero_grad(set_to_none=True)
    trainer = _RefTrainerStub(tm, tt_r, params, opt)
    il = ref_losses.IL_Loss(trainer)

    ref_curve, ref_keys = [], []
    for it in range(n_micro):
        is_replay = kinds[it]
        trainer.backward_next()
        ref_train.change_beta(trainer, is_replay=is_replay)
        images, _, _, annots = batch_for(it)
        info = ref_train.training_iteration(
            trainer, il,
            {"img": torch.tensor(images.transpose(0, 3, 1, 2)),
             "annot": torch.tensor(annots)},
            is_replay=is_replay,
        )
        ref_curve.append(info["total_loss"])
        ref_keys.append(info)

    # ---- our trajectory: the real jitted steps (one compiled program per
    # batch kind, sharing TrainState — exactly the trainer's wiring)
    sched = ScheduleConfig(lr=IT_LR, every_iter=IT_EVERY)
    tx = make_optimizer(sched, svars["params"], use_clip=False)
    state = TrainState.create(
        params=svars["params"], batch_stats=svars["batch_stats"], tx=tx)
    anchors = jnp.asarray(anchors_for_shape(H, W))
    il_cfg = ILConfig()
    ss = StepStatics(every_iter=IT_EVERY, use_clip=True, grad_clip=0.1)
    step_inc = make_train_step(
        jm, jt, anchors, il_cfg, FocalConfig(),
        LossStatics(num_classes=IT_PAST + IT_NEW, num_past_class=IT_PAST,
                    incremental=True, use_distill=True,
                    distill_logits=False),
        ss, donate=False,
    )
    step_rep = make_train_step(
        jm, None, anchors, il_cfg, FocalConfig(),
        LossStatics(num_classes=IT_PAST + IT_NEW, num_past_class=IT_PAST,
                    incremental=False, is_replay=True,
                    use_enhance_error=True, enhance_error_method="L2"),
        ss, donate=False,
    )

    our_curve, our_keys = [], []
    for it in range(n_micro):
        is_replay = kinds[it]
        # change_beta semantics (train.py:133-150): set BOTH groups every
        # iteration
        state = state.replace(opt_state=set_beta1(
            state.opt_state, IT_BETA_REPLAY if is_replay else 0.9, "all"))
        images, boxes, labels, _ = batch_for(it)
        if is_replay:
            state, m = step_rep(state, jnp.asarray(images),
                                jnp.asarray(boxes), jnp.asarray(labels))
        else:
            state, m = step_inc(state, jnp.asarray(images),
                                jnp.asarray(boxes), jnp.asarray(labels),
                                teacher_variables=tvars)
        our_curve.append(float(m["total_loss"]))
        our_keys.append({k: float(v) for k, v in m.items()})

    # the curves track pointwise across BOTH batch kinds. Calibration
    # (r5 measurement, /tmp debug run recorded in the commit message):
    # rel deviation <= 0.25% through step 17, then threshold masks
    # (clip_loss >= 0.03 fg drop, teacher-fg > 0.05) amplify compounded
    # conv-numerics noise discretely — observed <= 6.5% in the tail.
    rels = [abs(o - r) / max(abs(r), 1e-6)
            for o, r in zip(our_curve, ref_curve)]
    for it, rel in enumerate(rels):
        bound = 0.025 if it < 18 else 0.12
        assert rel < bound, (
            f"step {it} ({'replay' if kinds[it] else 'new'}): "
            f"ours {our_curve[it]:.5f} vs ref {ref_curve[it]:.5f} "
            f"(rel {rel:.4f})")
    assert float(np.mean(rels)) < 0.02, f"mean rel {np.mean(rels):.4f}"

    # per-term agreement (the taxonomy the recorder logs): exact at step 0
    # (shared weights, composed loss), tight at mid-trajectory steps after
    # several Adam updates of each kind — catches a term silently
    # migrating between keys or drifting systematically
    inc_keys = ["cls_bg_loss", "cls_fg_loss", "reg_loss", "dist_cls_loss",
                "dist_reg_loss", "dist_feat_loss"]
    rep_keys = ["cls_bg_loss", "cls_fg_loss", "reg_loss", "enhance_loss"]
    for it, keys, rtol in ((0, inc_keys, 1e-3), (8, inc_keys, 2e-2),
                           (11, rep_keys, 2e-2)):
        for k in keys:
            rk = ("replay_" + k) if kinds[it] else k
            assert rk in ref_keys[it], rk
            np.testing.assert_allclose(
                our_keys[it][k], ref_keys[it][rk], rtol=rtol, atol=1e-3,
                err_msg=f"step {it} {k}")
    assert kinds[8] is False and kinds[11] is True  # schedule invariant
    # the composition is non-degenerate: fg/reg fire, distill fires
    assert ref_keys[0]["cls_fg_loss"] > 0.1 and ref_keys[0]["reg_loss"] > 0.1
    assert ref_keys[0]["dist_feat_loss"] > 0.5
    # both actually trained: the total fell over the trajectory
    last_new = max(i for i in range(n_micro) if not kinds[i])
    first_new = min(i for i in range(n_micro) if not kinds[i])
    assert ref_curve[last_new] < ref_curve[first_new], "ref never moved"
    assert our_curve[last_new] < our_curve[first_new], "ours never moved"


def test_warm_classifier_trajectory_equivalence(il_trajectory_models,
                                                ref_cpu):
    """The state-1 WARM stage (warm_layers='output'), trajectory level: 12
    micro-steps where only the classifier output conv trains. Reference
    semantics composed here (train.py:15-80 + il_trainer warm_up):
    freeze_layers(['classificationModel.output']) so frozen params get NO
    grad, IL_Loss takes the PLAIN branch (no distill even at state 1,
    losses.py:543-549), no grad clip (train.py:53-55), and the old-class
    rows of the output conv get their grads zeroed per anchor slot
    (train.py:58-66). Ours: trainable_mask + StepStatics(warm_classifier)
    on the same shared weights. Asserts curve tracking AND the structural
    invariants: backbone/FPN/old-class rows bit-frozen in BOTH frameworks,
    new-class rows actually move."""
    import copy

    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import StepStatics, make_train_step
    from cl_object_detection_tpu.train.trainer import trainable_mask

    tm, _tt, jm, _jt, svars, _tvars = il_trajectory_models
    n_micro = 12
    batches = [_ts_batch_classes(400 + i, IT_PAST, IT_PAST + IT_NEW)
               for i in range(4)]

    # ---- reference: warm stage 0 active, output-only white list
    tm = copy.deepcopy(tm)
    states = [dict(num_past_class=0, num_knowing_class=IT_PAST),
              dict(num_past_class=IT_PAST,
                   num_knowing_class=IT_PAST + IT_NEW)]
    params = RefParams(states, every_iter=IT_EVERY, mas=False, agem=False,
                       no_clip=False, warm_layers=["output"],
                       beta_on_replay=0.9, beta_on_where="all")
    white_list = ["classificationModel.output"]
    group1 = [p for n, p in tm.named_parameters()
              if not any(w in n for w in white_list)]
    tm.train()
    tm.freeze_bn()
    tm.freeze_layers(["classificationModel.output"])  # il_trainer.py:352-377
    opt = torch.optim.Adam(
        [{"params": group1},
         {"params": tm.classificationModel.output.parameters()}], lr=IT_LR)
    opt.zero_grad(set_to_none=True)
    trainer = _RefTrainerStub(tm, None, params, opt)
    trainer.cur_warm_stage = 0
    ref_params0 = {n: p.detach().clone() for n, p in tm.named_parameters()}
    il = ref_losses.IL_Loss(trainer)

    ref_curve = []
    for it in range(n_micro):
        trainer.backward_next()
        ref_train.change_beta(trainer, is_replay=False)
        images, _, _, annots = batches[it % len(batches)]
        info = ref_train.training_iteration(
            trainer, il,
            {"img": torch.tensor(images.transpose(0, 3, 1, 2)),
             "annot": torch.tensor(annots)},
            is_replay=False,
        )
        ref_curve.append(info["total_loss"])

    # ---- ours: the real warm-configured step (trainer wiring:
    # _loss_statics forces the plain branch, _step_statics sets
    # warm_classifier + no clip, warm_up builds the trainable mask)
    sched = ScheduleConfig(lr=IT_LR, every_iter=IT_EVERY)
    tx = make_optimizer(sched, svars["params"], use_clip=False)
    state = TrainState.create(
        params=svars["params"], batch_stats=svars["batch_stats"], tx=tx)
    params0 = jax.tree.map(np.asarray, state.params)
    anchors = jnp.asarray(anchors_for_shape(H, W))
    step = make_train_step(
        jm, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=IT_PAST + IT_NEW, num_past_class=IT_PAST,
                    incremental=False),
        StepStatics(every_iter=IT_EVERY, use_clip=False,
                    warm_classifier=True, num_past_class=IT_PAST,
                    num_knowing_class=IT_PAST + IT_NEW, num_anchors=9),
        donate=False,
    )
    mask = trainable_mask(state.params, "output")
    our_curve = []
    for it in range(n_micro):
        images, boxes, labels, _ = batches[it % len(batches)]
        state, m = step(state, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(labels), trainable_mask=mask)
        our_curve.append(float(m["total_loss"]))

    # curve tracking: only the output conv trains, so the trajectory is
    # far better conditioned than the full incremental one
    for it, (o, r) in enumerate(zip(our_curve, ref_curve)):
        assert abs(o - r) / max(abs(r), 1e-6) < 0.01, (
            f"step {it}: ours {o:.5f} vs ref {r:.5f}")
    assert ref_curve[-1] < ref_curve[0], "warm stage never trained"

    # structural invariants, both frameworks:
    from cl_object_detection_tpu.models.convert import _map_full_key

    A, C, P = 9, IT_PAST + IT_NEW, IT_PAST
    for name, rp in tm.named_parameters():
        rp = rp.detach()
        r0 = ref_params0[name]
        path_parts, pname, collection = _map_full_key(name)
        if collection != "params":
            continue
        node_new, node_old = state.params, params0
        for part in path_parts:
            node_new, node_old = node_new[part], node_old[part]
        ours_new, ours_old = np.asarray(node_new[pname]), node_old[pname]
        if "classificationModel.output" not in name:
            # frozen everywhere else — torch via requires_grad=False,
            # ours via the mask + fresh-optimizer zero moments
            assert torch.equal(rp, r0), f"ref moved frozen {name}"
            np.testing.assert_array_equal(ours_new, ours_old,
                                          err_msg=f"ours moved frozen {name}")
        else:
            rp_np = rp.numpy()
            r0_np = r0.numpy()
            if rp_np.ndim == 4:
                rp_np = rp_np.transpose(2, 3, 1, 0)
                r0_np = r0_np.transpose(2, 3, 1, 0)
            # anchor-major rows: old classes frozen by the grad zeroing,
            # new classes trained (train.py:58-66)
            rr = rp_np.reshape(rp_np.shape[:-1] + (A, C))
            rr0 = r0_np.reshape(rr.shape)
            oo = ours_new.reshape(rr.shape)
            oo0 = ours_old.reshape(rr.shape)
            np.testing.assert_array_equal(rr[..., :P], rr0[..., :P],
                                          err_msg=f"ref old rows moved {name}")
            np.testing.assert_array_equal(oo[..., :P], oo0[..., :P],
                                          err_msg=f"our old rows moved {name}")
            assert np.abs(rr[..., P:] - rr0[..., P:]).max() > 0, name
            assert np.abs(oo[..., P:] - oo0[..., P:]).max() > 0, name


def test_bic_trajectory_equivalence(il_trajectory_models, ref_cpu,
                                    monkeypatch):
    """The post-epoch BiC phase (IL_method/bic.py:186-227), trajectory
    level: 12 Adam steps where the detector is frozen and ONLY the current
    state's bias scalars (alpha, beta) train on held-out batches, via the
    reference's own ``IL_Loss.forward(is_replay=True, is_bic=True)`` path
    — raw logits -> ``bic_correction`` -> sigmoid -> focal with the
    replay fg-clip, enhance_error suppressed by ``is_bic``
    (losses.py:558-593) — against our ``il.bic.BicTrainer._train_step``
    from the same shared weights. Asserts the loss curves AND the
    (alpha, beta) trajectories track, completing the composed-semantics
    matrix: joint, incremental, warm, BiC."""
    import copy

    import jax.numpy as jnp

    from cl_object_detection_tpu.config import BiCConfig, FocalConfig, ILConfig
    from cl_object_detection_tpu.il.bic import BicTrainer
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape

    tm, _tt, jm, _jt, svars, _tvars = il_trajectory_models
    n_steps = 12
    BIC_LR = 1e-3  # bic.py:96
    # the BiC held-out set carves images from BOTH streams (bic.py:98-132)
    # -> batches label over the full knowing range
    batches = [_ts_batch_classes(500 + i, 0, IT_PAST + IT_NEW)
               for i in range(4)]

    # ---- reference: Bic_Evaluator bias layers + the bic_training loop
    # body (Bic_Trainer.bic_training without its dataset plumbing).
    # BiasLayer hardcodes device='cuda' in its Parameter constructions
    # (bic.py:15-16) and Bic_Evaluator calls Module.cuda() (bic.py:27);
    # route both to CPU like the ref_cpu fixture does for tensors.
    real_ones, real_zeros = torch.ones, torch.zeros

    def _cpu(fn):
        return lambda *a, **k: fn(
            *a, **{kk: v for kk, v in k.items() if kk != "device"})

    monkeypatch.setattr(torch, "ones", _cpu(real_ones))
    monkeypatch.setattr(torch, "zeros", _cpu(real_zeros))
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    sys.path.insert(0, REF)
    try:
        from IL_method import bic as ref_bic
    finally:
        sys.path.remove(REF)

    tm = copy.deepcopy(tm)
    states = [dict(num_past_class=0, num_knowing_class=IT_PAST,
                   num_new_class=IT_PAST),
              dict(num_past_class=IT_PAST,
                   num_knowing_class=IT_PAST + IT_NEW,
                   num_new_class=IT_NEW)]
    params = RefParams(states, bic=True, every_iter=1, mas=False,
                       agem=False, no_clip=False,
                       beta_on_replay=0.9, beta_on_where="all")
    evaluator = ref_bic.Bic_Evaluator(params, cur_state=1)
    tm.train()
    tm.freeze_bn()
    tm.freeze_layers([])  # bic_training freezes the whole detector
    opt = torch.optim.Adam(
        evaluator.bias_layers[0].parameters(), lr=BIC_LR)  # bic.py:96
    trainer = _RefTrainerStub(tm, None, params, opt)
    trainer.bic = evaluator
    il = ref_losses.IL_Loss(trainer)

    ref_curve, ref_ab = [], []
    opt.zero_grad()
    for it in range(n_steps):
        images, _, _, annots = batches[it % len(batches)]
        losses = il.forward(
            torch.tensor(images.transpose(0, 3, 1, 2)),
            torch.tensor(annots), is_replay=True, is_bic=True)
        loss = torch.tensor(0.0)
        for v in losses.values():
            if v is not None:
                loss = loss + v
        ref_curve.append(float(loss.detach()))
        loss.backward()
        opt.step()
        opt.zero_grad()
        bl = evaluator.bias_layers[0]
        ref_ab.append((float(bl.alpha.detach()), float(bl.beta.detach())))

    # ---- ours: the real BicTrainer step (masked Adam over the per-state
    # scalar vectors, loss via compute_losses with bic_correct)
    anchors = jnp.asarray(anchors_for_shape(H, W))
    bt = BicTrainer(
        jm, anchors, ILConfig(), FocalConfig(), BiCConfig(lr=BIC_LR),
        new_class_counts=[IT_PAST, IT_NEW], cur_state=1,
        num_past_class=IT_PAST, bic_loader=None)
    tree, opt_state = bt.params.tree(), bt.opt_state
    our_curve, our_ab = [], []
    for it in range(n_steps):
        images, boxes, labels, _ = batches[it % len(batches)]
        tree, opt_state, m = bt._train_step(
            tree, opt_state, svars, anchors, jnp.asarray(images),
            jnp.asarray(boxes), jnp.asarray(labels))
        our_curve.append(float(m["total_loss"]))
        our_ab.append((float(tree["alphas"][0]), float(tree["betas"][0])))

    # the detector is frozen, so the only trajectory state is the two
    # scalars — conv-numerics noise cannot compound through the weights
    for it, (o, r) in enumerate(zip(our_curve, ref_curve)):
        assert abs(o - r) / max(abs(r), 1e-6) < 0.01, (
            f"step {it}: ours {o:.5f} vs ref {r:.5f}")
    for it, ((oa, ob), (ra, rb)) in enumerate(zip(our_ab, ref_ab)):
        np.testing.assert_allclose(oa, ra, rtol=0, atol=2e-3,
                                   err_msg=f"alpha step {it}")
        np.testing.assert_allclose(ob, rb, rtol=0, atol=2e-3,
                                   err_msg=f"beta step {it}")
    # non-degenerate: the bias scalars actually moved, the same way
    assert abs(ref_ab[-1][0] - 1.0) > 5e-3, "alpha never trained"
    assert abs(our_ab[-1][0] - 1.0) > 5e-3
    assert np.sign(ref_ab[-1][0] - 1.0) == np.sign(our_ab[-1][0] - 1.0)
    # the detector stayed bit-frozen on the reference side too
    for n, p in tm.named_parameters():
        assert not p.requires_grad, n


def test_final_correction_trajectory_equivalence(il_trajectory_models,
                                                 ref_cpu):
    """The FINAL-CORRECTION phase (train.py:118-131, 323-331), trajectory
    level. Two parts:

    (a) Quirk proof: the reference's ``correction_new_class`` does
        ``loss.backward(); optimizer.step()`` but — unlike
        ``training_iteration`` (train.py:72-73) — never calls
        ``zero_grad``, so gradients ACCUMULATE across correction
        iterations (step k applies the sum of grads 1..k). Proven here
        by driving the reference's own function twice and observing the
        stale grad. Our ``_final_correction`` deliberately takes clean
        per-batch steps instead (README §Reference divergences).

    (b) Trajectory equivalence under the intended semantics: 12 steps of
        the enhance-only objective (zero_grad inserted between reference
        iterations) vs our ``correction=True`` jitted step from shared
        weights — the enhance-loss curves track and both frameworks
        drive the term down. Completes the composed-semantics matrix:
        joint, incremental, warm, BiC, final-correction."""
    import copy

    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import StepStatics, make_train_step

    tm0, _tt, jm, _jt, svars, _tvars = il_trajectory_models
    n_steps = 12
    # correction runs over the REPLAY loader (train.py:328) -> old classes
    batches = [_ts_batch_classes(600 + i, 0, IT_PAST) for i in range(4)]
    states = [dict(num_past_class=0, num_knowing_class=IT_PAST),
              dict(num_past_class=IT_PAST,
                   num_knowing_class=IT_PAST + IT_NEW)]

    def make_ref():
        tm = copy.deepcopy(tm0)
        params = RefParams(states, enhance_error=True,
                           enhance_error_method="L2", every_iter=1,
                           mas=False, agem=False, no_clip=False,
                           beta_on_replay=0.9, beta_on_where="all")
        white_list = ["classificationModel.output"]
        group1 = [p for n, p in tm.named_parameters()
                  if not any(w in n for w in white_list)]
        tm.train()
        tm.freeze_bn()
        opt = torch.optim.Adam(
            [{"params": group1},
             {"params": tm.classificationModel.output.parameters()}],
            lr=IT_LR)
        opt.zero_grad(set_to_none=True)
        trainer = _RefTrainerStub(tm, None, params, opt)
        return tm, opt, trainer, ref_losses.IL_Loss(trainer)

    def ref_data(it):
        images, _, _, annots = batches[it % len(batches)]
        return {"img": torch.tensor(images.transpose(0, 3, 1, 2)),
                "annot": torch.tensor(annots)}

    # ---- (a) the missing-zero_grad accumulation quirk, on the
    # reference's own function
    tm, opt, trainer, il = make_ref()
    clean = ref_train.correction_new_class(trainer, il, ref_data(0))
    assert clean is False, "enhance term degenerate: no correction fired"
    probe = next(p for n, p in tm.named_parameters()
                 if "classificationModel.output" in n)
    stale = probe.grad.detach().clone()
    assert float(stale.abs().max()) > 0, (
        "correction_new_class cleared its grads — quirk gone; update the "
        "README divergence entry and make _final_correction faithful")
    ref_train.correction_new_class(trainer, il, ref_data(0))
    # step 2 applied grad_1 + grad_2, not grad_2: the residual kept growing
    assert float(probe.grad.detach().abs().max()) > float(stale.abs().max())

    # ---- (b) trajectory under the intended (clean-step) semantics
    tm, opt, trainer, il = make_ref()
    ref_curve = []
    for it in range(n_steps):
        losses = il.forward(ref_data(it)["img"].float(),
                            ref_data(it)["annot"], is_replay=True)
        loss = losses["enhance_loss"]
        ref_curve.append(float(loss.detach()))
        loss.backward()
        opt.step()
        opt.zero_grad(set_to_none=True)

    sched = ScheduleConfig(lr=IT_LR, every_iter=1)
    tx = make_optimizer(sched, svars["params"], use_clip=False)
    state = TrainState.create(
        params=svars["params"], batch_stats=svars["batch_stats"], tx=tx)
    anchors = jnp.asarray(anchors_for_shape(H, W))
    # the exact statics pair ILTrainer builds for correction=True
    # (trainer.py _loss_statics(enhance_only=True) + _step_statics)
    step = make_train_step(
        jm, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=IT_PAST + IT_NEW, num_past_class=IT_PAST,
                    incremental=False, is_replay=True,
                    use_enhance_error=True, enhance_error_method="L2",
                    enhance_only=True),
        StepStatics(every_iter=1, use_clip=False, warm_classifier=False,
                    num_past_class=IT_PAST,
                    num_knowing_class=IT_PAST + IT_NEW, num_anchors=9),
        donate=False,
    )
    our_curve = []
    for it in range(n_steps):
        images, boxes, labels, _ = batches[it % len(batches)]
        state, m = step(state, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(labels))
        our_curve.append(float(m["enhance_loss"]))

    # the objective is a thresholded tail statistic (scores > 0.05,
    # losses.py:591-603): mask-membership flips near the threshold make
    # this the noisiest term in the taxonomy, so the bound is looser than
    # the dense-objective trajectories
    for it, (o, r) in enumerate(zip(our_curve, ref_curve)):
        assert abs(o - r) / max(abs(r), 1e-6) < 0.05, (
            f"step {it}: ours {o:.5f} vs ref {r:.5f}")
    # both frameworks drive the term toward clean, the phase's whole
    # point (at the test lr the 12-step descent is ~10%; calibrated run:
    # 0.00338 -> 0.00300)
    assert ref_curve[-1] < 0.95 * ref_curve[0], "ref correction never bit"
    assert our_curve[-1] < 0.95 * our_curve[0], "our correction never bit"


def test_agem_trajectory_equivalence(il_trajectory_models, ref_cpu):
    """A-GEM (IL_method/agem.py), trajectory level. Two parts:

    (a) ``fix_grad`` formula parity on a manufactured conflicting
        gradient pair (guarantees the ``angle < 0`` projection branch
        executes): the reference's own ``A_GEM.fix_grad`` on a tiny torch
        module vs ``train.step._agem_project`` on the same arrays — exact
        to 1e-5, with the 'bn'-name exclusion (agem.py:76,122-143)
        honored by both (ours via the zeroed bn leaves of
        ``il.agem.bn_mask``).

    (b) 12 iterations of the A-GEM training path from shared weights:
        per-iteration replay-gradient recompute (train.py:233-234
        semantics = our ``refresh_every=1``) over the same 2 replay
        batches — each batch's grad clipped to 0.1 then averaged — and
        the main-step clip -> project -> Adam pipeline (train.py:60-69).
        Asserts the replay-grad global norms match per iteration and the
        loss curves track; the measured sign sequence (no conflicting
        step in this window) is pinned, with the active projection
        branch covered by part (a)."""
    import copy

    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.agem import AGem
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import (
        StepStatics,
        _agem_project,
        make_train_step,
    )

    sys.path.insert(0, REF)
    try:
        from IL_method.agem import A_GEM
    finally:
        sys.path.remove(REF)

    # ---- (a) manufactured-conflict fix_grad parity
    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Linear(7, 5, bias=True)
            self.bn_scale = torch.nn.Parameter(torch.ones(5))

    tiny = Tiny()
    rng = np.random.RandomState(0)
    g = {n: rng.randn(*p.shape).astype(np.float32)
         for n, p in tiny.named_parameters()}
    # anti-aligned replay grad on the non-bn part -> angle < 0 guaranteed
    r = {n: (-0.5 * v + 0.05 * rng.randn(*v.shape)).astype(np.float32)
         for n, v in g.items()}
    for n, p in tiny.named_parameters():
        p.grad = torch.tensor(g[n])
    ref_agem = A_GEM(dataloader_replay=None, num_groups=1)
    ref_agem.replay_grad = torch.cat(
        [torch.tensor(r[n]).view(-1) for n, _ in tiny.named_parameters()
         if "bn" not in n])
    ref_agem.fix_grad(tiny)
    ref_proj = {n: p.grad.numpy().copy() for n, p in tiny.named_parameters()}
    ours_proj = _agem_project(
        {n: jnp.asarray(v) for n, v in g.items()},
        {n: (jnp.zeros_like(jnp.asarray(v)) if "bn" in n
             else jnp.asarray(r[n])) for n, v in g.items()})
    for n in g:
        np.testing.assert_allclose(np.asarray(ours_proj[n]), ref_proj[n],
                                   rtol=1e-5, atol=1e-6, err_msg=n)
    assert np.abs(ref_proj["conv.weight"] - g["conv.weight"]).max() > 1e-4
    np.testing.assert_array_equal(ref_proj["bn_scale"], g["bn_scale"])

    # ---- (b) trajectory
    tm0, _tt, jm, _jt, svars, _tvars = il_trajectory_models
    n_iter = 12
    new_batches = [_ts_batch_classes(700 + i, IT_PAST, IT_PAST + IT_NEW)
                   for i in range(4)]
    rep_batches = [_ts_batch_classes(800 + i, 0, IT_PAST) for i in range(2)]
    states = [dict(num_past_class=0, num_knowing_class=IT_PAST),
              dict(num_past_class=IT_PAST,
                   num_knowing_class=IT_PAST + IT_NEW)]

    tm = copy.deepcopy(tm0)
    params = RefParams(states, agem=True, every_iter=1, mas=False,
                       no_clip=False, beta_on_replay=0.9,
                       beta_on_where="all")
    white_list = ["classificationModel.output"]
    group1 = [p for n, p in tm.named_parameters()
              if not any(w in n for w in white_list)]
    tm.train()
    tm.freeze_bn()
    opt = torch.optim.Adam(
        [{"params": group1},
         {"params": tm.classificationModel.output.parameters()}], lr=IT_LR)
    opt.zero_grad(set_to_none=True)
    trainer = _RefTrainerStub(tm, None, params, opt)

    def rdata(images, annots):
        return {"img": torch.tensor(images.transpose(0, 3, 1, 2)),
                "annot": torch.tensor(annots)}

    replay_loader_ref = [rdata(b[0], b[3]) for b in rep_batches]
    agem_ref = A_GEM(dataloader_replay=replay_loader_ref,
                     num_groups=len(replay_loader_ref))
    trainer.agem = agem_ref
    il = ref_losses.IL_Loss(trainer)

    # record the projection decision by wrapping the reference's own
    # fix_grad with the same flat-vector formula it uses internally
    ref_signs = []
    real_fix = agem_ref.fix_grad

    def recording_fix(model):
        cur = torch.cat([p.grad.view(-1) for n, p in model.named_parameters()
                         if "bn" not in n and p.requires_grad])
        ref_signs.append(
            bool((cur * agem_ref.replay_grad).sum() < 0))
        return real_fix(model)

    agem_ref.fix_grad = recording_fix

    ref_curve, ref_rnorms = [], []
    for it in range(n_iter):
        trainer.backward_next()
        ref_train.change_beta(trainer, is_replay=False)
        agem_ref.cal_replay_grad(il)  # per-iteration refresh (train.py:233)
        ref_rnorms.append(float(agem_ref.replay_grad.norm()))
        images, _, _, annots = new_batches[it % len(new_batches)]
        info = ref_train.training_iteration(trainer, il,
                                            rdata(images, annots),
                                            is_replay=False)
        ref_curve.append(info["total_loss"])
    assert len(ref_signs) == n_iter

    # ---- ours
    sched = ScheduleConfig(lr=IT_LR, every_iter=1)
    tx = make_optimizer(sched, svars["params"], use_clip=False)
    state = TrainState.create(
        params=svars["params"], batch_stats=svars["batch_stats"], tx=tx)
    anchors = jnp.asarray(anchors_for_shape(H, W))

    class _Loader(list):
        pass

    loader = _Loader()
    for images, boxes, labels, _ in rep_batches:
        loader.append(types.SimpleNamespace(
            images=jnp.asarray(images), boxes=jnp.asarray(boxes),
            labels=jnp.asarray(labels)))
    agem_ours = AGem(
        jm, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=IT_PAST + IT_NEW, num_past_class=IT_PAST,
                    incremental=False, is_replay=True),
        replay_loader=loader)
    step = make_train_step(
        jm, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=IT_PAST + IT_NEW, num_past_class=IT_PAST,
                    incremental=True),
        StepStatics(every_iter=1, use_clip=True, grad_clip=0.1,
                    warm_classifier=False, num_past_class=IT_PAST,
                    num_knowing_class=IT_PAST + IT_NEW, num_anchors=9,
                    use_agem=True),
        donate=False,
    )
    our_curve, our_rnorms = [], []
    for it in range(n_iter):
        rg = agem_ours.compute_replay_grad(
            {"params": state.params, "batch_stats": state.batch_stats})
        our_rnorms.append(float(jnp.sqrt(sum(
            jnp.sum(x * x) for x in jax.tree.leaves(rg)))))
        images, boxes, labels, _ = new_batches[it % len(new_batches)]
        state, m = step(state, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(labels), replay_grad=rg)
        our_curve.append(float(m["total_loss"]))

    # replay-gradient parity, iteration by iteration: same clipped,
    # averaged, bn-excluded gradient of the same replay loss
    for it, (o, r_) in enumerate(zip(our_rnorms, ref_rnorms)):
        assert abs(o - r_) / max(r_, 1e-9) < 0.02, (
            f"replay-grad norm step {it}: ours {o:.6f} vs ref {r_:.6f}")
    # loss curves track (same bounds family as the incremental oracle)
    for it, (o, r_) in enumerate(zip(our_curve, ref_curve)):
        assert abs(o - r_) / max(abs(r_), 1e-6) < 0.03, (
            f"step {it}: ours {o:.5f} vs ref {r_:.5f}")
    # measured behavior of this window (fixed seeds): the new-class and
    # replay gradients never anti-align — no step projects, in EITHER
    # framework (if ours projected while the reference didn't, the curve
    # and replay-norm parity above would break). The active angle<0
    # branch is covered exactly by part (a); pinning the measured sign
    # sequence keeps the composed no-op wiring honest too.
    assert not any(ref_signs), f"conflict appeared; recalibrate: {ref_signs}"
    assert ref_curve[-1] < ref_curve[0] and our_curve[-1] < our_curve[0]


def test_mas_trajectory_equivalence(il_trajectory_models, ref_cpu, tmp_path):
    """MAS (IL_method/mas.py), both halves against the reference's own
    code:

    (a) Importance parity: the reference's ``MAS.calculate_importance``
        (the |d||output||^2/d theta| pass with the sum(cls^2)/(B*C) +
        mean-|reg[positives]| objective, bn + classifier-output excluded,
        mas.py:91-130) vs ``il.mas.compute_importance`` on the same
        weights and the same 2 batches — per-tensor agreement through
        the layout mapping.

    (b) Penalty trajectory: 12 steps with the MAS penalty in the loss
        (training_iteration train.py:41-46: penalty added before the
        every_iter division) from shared weights, each framework using
        ITS OWN computed importance and the shared initial weights as
        the previous model — loss curves track and the penalty term
        becomes nonzero as params drift."""
    import copy

    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        MASConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.il.mas import compute_importance
    from cl_object_detection_tpu.models.convert import _map_full_key
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import StepStatics, make_train_step

    sys.path.insert(0, REF)
    try:
        from IL_method.mas import MAS
    finally:
        sys.path.remove(REF)

    tm0, _tt, jm, _jt, svars, _tvars = il_trajectory_models
    MAS_RATIO = 1e4   # penalty visible within 12 short steps; both sides
    n_iter = 12
    imp_batches = [_ts_batch_classes(900 + i, 0, IT_PAST + IT_NEW)
                   for i in range(2)]
    new_batches = [_ts_batch_classes(950 + i, IT_PAST, IT_PAST + IT_NEW)
                   for i in range(4)]
    states = [dict(num_past_class=0, num_knowing_class=IT_PAST),
              dict(num_past_class=IT_PAST,
                   num_knowing_class=IT_PAST + IT_NEW)]

    tm = copy.deepcopy(tm0)
    (tmp_path / "state1").mkdir()
    params = RefParams(states, mas=True, mas_ratio=MAS_RATIO,
                       ckp_path=str(tmp_path), every_iter=1, agem=False,
                       no_clip=False, beta_on_replay=0.9,
                       beta_on_where="all")

    def rdata(images, annots):
        return {"img": torch.tensor(images.transpose(0, 3, 1, 2)),
                "annot": torch.tensor(annots)}

    # ---- (a) importance parity
    mas_ref = MAS(tm, params)
    mas_ref.calculate_importance(
        [rdata(b[0], b[3]) for b in imp_batches], 1)
    assert mas_ref.load_importance(1)
    anchors = jnp.asarray(anchors_for_shape(H, W))

    loader = [types.SimpleNamespace(images=jnp.asarray(b[0]),
                                    boxes=jnp.asarray(b[1]),
                                    labels=jnp.asarray(b[2]))
              for b in imp_batches]
    imp_ours = compute_importance(jm, svars, anchors, loader)

    checked = 0
    for name, ref_imp in mas_ref.precision_matrices.items():
        assert "bn" not in name and "classificationModel.output" not in name
        path_parts, pname, collection = _map_full_key(name)
        if collection != "params":
            continue
        node = imp_ours
        for part in path_parts:
            node = node[part]
        ours = np.asarray(node[pname])
        ref_np = ref_imp.numpy()
        if ref_np.ndim == 4:
            ref_np = ref_np.transpose(2, 3, 1, 0)
        # |grad|-mean importance spans orders of magnitude per tensor and
        # its near-zero entries are pure conv-numerics noise (calibrated:
        # an FPN conv with max 1.7e-6 carries a sub-percent noise tail
        # with rel errors up to ~0.7 on ~1e-9 entries), so per-element
        # tail bounds are the wrong instrument. Assert the importance
        # FIELD matches: mean rel err with a mean floor, total mass, and
        # elementwise correlation
        denom = np.abs(ref_np) + float(ref_np.mean()) + 1e-20
        err = np.abs(ours - ref_np) / denom
        assert float(err.mean()) < 0.02, f"{name}: mean err {err.mean():.4f}"
        mass = float(ours.sum()) / max(float(ref_np.sum()), 1e-20)
        assert 0.98 < mass < 1.02, f"{name}: mass ratio {mass:.4f}"
        if ours.size > 4 and float(ref_np.std()) > 0:
            corr = float(np.corrcoef(ours.ravel(), ref_np.ravel())[0, 1])
            assert corr > 0.99, f"{name}: corr {corr:.4f}"
        checked += 1
    assert checked > 50  # the whole backbone+FPN+head stack was compared
    # excluded leaves are zero on our side (bn + classifier output conv)
    assert float(jnp.abs(
        imp_ours["classification_head"]["output"]["kernel"]).max()) == 0.0

    # ---- (b) penalty trajectory
    white_list = ["classificationModel.output"]
    group1 = [p for n, p in tm.named_parameters()
              if not any(w in n for w in white_list)]
    tm.train()
    tm.freeze_bn()
    opt = torch.optim.Adam(
        [{"params": group1},
         {"params": tm.classificationModel.output.parameters()}], lr=IT_LR)
    opt.zero_grad(set_to_none=True)
    trainer = _RefTrainerStub(tm, None, params, opt)
    trainer.prev_model = copy.deepcopy(tm0)   # state-entry snapshot
    trainer.mas = mas_ref
    il = ref_losses.IL_Loss(trainer)

    ref_curve, ref_pen = [], []
    for it in range(n_iter):
        trainer.backward_next()
        ref_train.change_beta(trainer, is_replay=False)
        images, _, _, annots = new_batches[it % len(new_batches)]
        info = ref_train.training_iteration(trainer, il,
                                            rdata(images, annots),
                                            is_replay=False)
        ref_curve.append(info["total_loss"])
        ref_pen.append(info["mas_loss"])

    sched = ScheduleConfig(lr=IT_LR, every_iter=1)
    tx = make_optimizer(sched, svars["params"], use_clip=False)
    state = TrainState.create(
        params=svars["params"], batch_stats=svars["batch_stats"], tx=tx)
    prev_params = jax.tree.map(jnp.array, svars["params"])
    il_cfg = ILConfig(mas=MASConfig(enabled=True, ratio=MAS_RATIO))
    step = make_train_step(
        jm, None, anchors, il_cfg, FocalConfig(),
        LossStatics(num_classes=IT_PAST + IT_NEW, num_past_class=IT_PAST,
                    incremental=True, use_mas=True),
        StepStatics(every_iter=1, use_clip=True, grad_clip=0.1,
                    warm_classifier=False, num_past_class=IT_PAST,
                    num_knowing_class=IT_PAST + IT_NEW, num_anchors=9),
        donate=False,
    )
    our_curve, our_pen = [], []
    for it in range(n_iter):
        images, boxes, labels, _ = new_batches[it % len(new_batches)]
        state, m = step(state, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(labels),
                        mas_prev_params=prev_params,
                        mas_importance=imp_ours)
        our_curve.append(float(m["total_loss"]))
        our_pen.append(float(m["mas_loss"]))

    for it, (o, r_) in enumerate(zip(our_curve, ref_curve)):
        assert abs(o - r_) / max(abs(r_), 1e-6) < 0.03, (
            f"step {it}: ours {o:.5f} vs ref {r_:.5f}")
    # the penalty engaged: zero at entry (params == prev), nonzero once
    # the params drift, in BOTH frameworks, and the terms agree loosely
    # (quadratic in the drift -> extra-sensitive to compounded numerics)
    assert ref_pen[0] < 1e-8 and our_pen[0] < 1e-8
    assert ref_pen[-1] > 1e-4 and our_pen[-1] > 1e-4
    assert abs(our_pen[-1] - ref_pen[-1]) / ref_pen[-1] < 0.15, (
        f"penalty: ours {our_pen[-1]:.6f} vs ref {ref_pen[-1]:.6f}")
