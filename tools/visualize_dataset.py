#!/usr/bin/env python
"""Batch dataset/detection visualizer.

A WORKING replacement for the reference's broken ``visualize.py``
(/root/reference/visualize.py:17-107, which imports datasets that don't
exist there): draws ground-truth boxes — and model detections when a
checkpoint is given — for a sample of a COCO-json dataset.

    python tools/visualize_dataset.py --json data/voc2007/train.json \
        --out_dir vis/ --num 8 [--scenario 20 --state 0 --root_dir . --cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", required=True)
    p.add_argument("--image_dir", default=None)
    p.add_argument("--out_dir", default="vis_out")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--root_dir", default=".")
    p.add_argument("--scenario", nargs="+", default=None,
                   help="with --state: also draw model detections")
    p.add_argument("--state", type=int, default=0)
    p.add_argument("--epoch", type=int, default=-1)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--score_thresh", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2
    import numpy as np

    from cl_object_detection_tpu.data.coco import CocoJson

    coco = CocoJson(a.json)
    image_dir = a.image_dir or os.path.join(os.path.dirname(a.json), "images")
    os.makedirs(a.out_dir, exist_ok=True)

    predict = None
    variables = None
    model = None
    if a.scenario:
        import jax
        import jax.numpy as jnp

        from cl_object_detection_tpu.config import ModelConfig, PredictConfig
        from cl_object_detection_tpu.eval.predictor import make_predict_fn
        from cl_object_detection_tpu.models import create_retinanet
        from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(os.path.join(a.root_dir, "checkpoint"), a.scenario)
        tree, il_meta = ckpt.restore(a.state, a.epoch)
        num_classes = il_meta["num_classes"] if il_meta else len(coco.cats)
        model = create_retinanet(ModelConfig(depth=a.depth), num_classes)
        variables = {
            "params": jax.tree.map(jnp.asarray, tree["params"]),
            "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"]),
        }
        # apply the checkpoint's BiC correction like cli.detect/validate,
        # so the drawn detections match what eval reports
        bic_correct = None
        if il_meta and "bic" in il_meta:
            from cl_object_detection_tpu.il.bic import bic_correct_from_meta

            counts = [int(x) if str(x).isdigit() else 1 for x in a.scenario]
            bic_correct = bic_correct_from_meta(il_meta, counts, num_classes)
        predict = make_predict_fn(model, PredictConfig(),
                                  bic_correct=bic_correct)

    img_ids = sorted(coco.imgs)[: a.num]
    for img_id in img_ids:
        info = coco.imgs[img_id]
        path = os.path.join(image_dir, info["file_name"])
        bgr = cv2.imread(path)
        if bgr is None:
            continue
        # predict on the PRISTINE image — drawing GT first would feed the
        # green overlays into the network and change its detections
        rgb_clean = (cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32)
                     / 255 if predict is not None else None)
        for ann in coco.get_anns_by_img(img_id):
            x, y, w, h = [int(v) for v in ann["bbox"]]
            cv2.rectangle(bgr, (x, y), (x + w, y + h), (0, 255, 0), 2)
            cv2.putText(bgr, coco.classes[ann["category_id"]], (x, max(y - 4, 10)),
                        cv2.FONT_HERSHEY_PLAIN, 1.0, (0, 255, 0), 1)
        if predict is not None:
            import jax.numpy as jnp

            from cl_object_detection_tpu.config import DataConfig
            from cl_object_detection_tpu.data.transforms import (
                normalize_image,
                resize_and_pad,
            )

            dcfg = DataConfig()
            img, _, scale = resize_and_pad(
                rgb_clean, np.zeros((0, 4), np.float32), dcfg.min_side,
                dcfg.max_side, dcfg.height, dcfg.width,
            )
            det = predict(variables, jnp.asarray(normalize_image(img)[None]))
            boxes = np.asarray(det.boxes[0]) / scale
            scores = np.asarray(det.scores[0])
            keep = np.asarray(det.valid[0]) & (scores > a.score_thresh)
            for i in np.where(keep)[0]:
                x1, y1, x2, y2 = boxes[i].astype(int)
                cv2.rectangle(bgr, (x1, y1), (x2, y2), (0, 0, 255), 2)
        out = os.path.join(a.out_dir, info["file_name"])
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        if not cv2.imwrite(out, bgr):
            raise SystemExit(f"failed to write {out}")
        print(out)


if __name__ == "__main__":
    main()
