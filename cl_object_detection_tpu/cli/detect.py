"""Single-image / image-dir detection CLI.

The reference's ``visualize_single_image.py`` equivalent
(/root/reference/visualize_single_image.py:35-132): load a checkpoint,
run the full resize->normalize->forward->decode->NMS path per image, draw
boxes above a score threshold with cv2, save annotated copies. CPU-capable
(BASELINE.md config 1).

    python -m cl_object_detection_tpu.cli.detect \
        --image_dir imgs/ --out_dir out/ --scenario 20 --state 0 \
        --class_list classes.csv [--cpu]
"""
from __future__ import annotations

import argparse
import os
from typing import List, Optional


def load_class_list(path: Optional[str], coco_json: Optional[str]):
    """Category table from a CSV 'name,id' per line
    (visualize_single_image.py:21-33) or a COCO json. Returns
    ({cat_id: name}, {name: cat_id})."""
    if path:
        names = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                name, idx = line.split(",")[:2]
                names[int(idx)] = name
        return names, {v: k for k, v in names.items()}
    if coco_json:
        from ..data.coco import CocoJson

        c = CocoJson(coco_json)
        return dict(c.classes), dict(c.classes_inverse)
    raise ValueError("need --class_list or --train_json")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--out_dir", default="detect_out")
    parser.add_argument("--class_list", default=None)
    parser.add_argument("--train_json", default=None)
    parser.add_argument("--root_dir", default=".")
    parser.add_argument("--scenario", nargs="+", default=["20"])
    parser.add_argument("--state", type=int, default=0)
    parser.add_argument("--epoch", type=int, default=-1)
    parser.add_argument("--depth", type=int, default=50)
    parser.add_argument("--score_thresh", type=float, default=0.5)
    parser.add_argument("--bic", action="store_true",
                        help="apply the checkpoint's BiC bias correction "
                             "(reference model.py:504-505)")
    parser.add_argument("--quantize", action="store_true",
                        help="int8 dynamic-PTQ convs (ops/quant.py)")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--torch_ckpt", default=None,
                        help="a REFERENCE-trained .pt checkpoint (or its "
                             ".npz conversion) to run instead of an Orbax "
                             "checkpoint tree")
    parser.add_argument("--num_classes", type=int, default=None,
                        help="class count for --torch_ckpt (default: "
                             "len(class list))")
    a = parser.parse_args(argv)

    import jax  # noqa: F401  (imported before any device touch)

    from .common import maybe_force_cpu

    maybe_force_cpu(a)

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from ..config import DataConfig, ModelConfig, PredictConfig
    from ..data.transforms import normalize_image, resize_and_pad
    from ..eval.predictor import make_predict_fn
    from ..models import create_retinanet
    from ..utils.checkpoint import CheckpointManager

    classes, classes_inverse = load_class_list(a.class_list, a.train_json)
    # model labels are FINAL-state CONTIGUOUS ids in the ILStates knowing
    # order — NOT category-id order (e.g. scenario '15 1' forces 'train'
    # into slot 15, states.py / reference params.py:53-55); map through
    # the same label map the evaluator uses
    from ..states import ILStates

    states = ILStates(
        [classes[i] for i in sorted(classes)], classes_inverse,
        list(a.scenario),
    )
    label_to_cat = states.inverse_label_map()

    def name_of(label: int) -> str:
        cat = label_to_cat.get(int(label))
        return classes.get(cat, str(label))

    bic_correct = None
    if a.torch_ckpt:
        from ..models.convert import load_reference_checkpoint

        num_classes = a.num_classes or len(classes)
        model = create_retinanet(ModelConfig(depth=a.depth), num_classes)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        variables = load_reference_checkpoint(init, a.torch_ckpt)
        if a.bic:
            print("warning: --bic ignored for --torch_ckpt (no meta)")
    else:
        ckpt = CheckpointManager(
            os.path.join(a.root_dir, "checkpoint"), a.scenario)
        tree, il_meta = ckpt.restore(a.state, a.epoch)
        num_classes = il_meta["num_classes"] if il_meta else len(classes)
        model = create_retinanet(ModelConfig(depth=a.depth), num_classes)
        variables = {
            "params": jax.tree.map(jnp.asarray, tree["params"]),
            "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"]),
        }
        if a.bic:
            from ..il.bic import bic_correct_from_meta

            # per-state new-class counts ride in the scenario flag; the
            # knowing count comes from the checkpoint meta
            counts = [int(s) if str(s).isdigit() else 1 for s in a.scenario]
            bic_correct = bic_correct_from_meta(il_meta, counts, num_classes)
            if bic_correct is None:
                print("warning: --bic requested but the checkpoint carries "
                      "no BiC state")
    predict = make_predict_fn(
        model, PredictConfig(quantize=a.quantize), bic_correct=bic_correct)
    dcfg = DataConfig()

    os.makedirs(a.out_dir, exist_ok=True)
    names = sorted(
        f for f in os.listdir(a.image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    for fname in names:
        path = os.path.join(a.image_dir, fname)
        bgr = cv2.imread(path)
        if bgr is None:
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        img, _, scale = resize_and_pad(
            rgb, np.zeros((0, 4), np.float32),
            dcfg.min_side, dcfg.max_side, dcfg.height, dcfg.width,
        )
        img = normalize_image(img)
        det = predict(variables, jnp.asarray(img[None]))
        boxes = np.asarray(det.boxes[0]) / scale
        scores = np.asarray(det.scores[0])
        labels = np.asarray(det.labels[0])
        keep = np.asarray(det.valid[0]) & (scores > a.score_thresh)

        for i in np.where(keep)[0]:
            x1, y1, x2, y2 = boxes[i].astype(int)
            name = name_of(labels[i])
            caption = f"{name} {scores[i]:.2f}"
            cv2.rectangle(bgr, (x1, y1), (x2, y2), (0, 0, 255), 2)
            cv2.putText(bgr, caption, (x1, max(y1 - 5, 12)),
                        cv2.FONT_HERSHEY_PLAIN, 1.2, (0, 255, 0), 2)
        out_path = os.path.join(a.out_dir, fname)
        cv2.imwrite(out_path, bgr)
        n = int(keep.sum())
        print(f"{fname}: {n} detections -> {out_path}")


if __name__ == "__main__":
    main()
