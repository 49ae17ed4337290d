#!/usr/bin/env python
"""CLI wrapper for cl_object_detection_tpu.utils.toydata.

Generates a tiny deterministic synthetic COCO-json dataset (colored
rectangles on noise backgrounds) for smoke-training / demo runs — the
dataset-layout stand-in for VOC2007 when no real data is mounted.

    python tools/make_toy_dataset.py --out /tmp/toy --train 16 --test 8 \
        [--classes a b c] [--seed 0]

Writes <out>/train.json + <out>/test.json + <out>/images/, matching the
layout cli.train/validate expect via --dataset <out>.
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    from cl_object_detection_tpu.utils.toydata import (
        DEFAULT_CLASSES,
        make_toy_dataset,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output dataset root dir")
    ap.add_argument("--train", type=int, default=16, help="#train images")
    ap.add_argument("--test", type=int, default=8, help="#test images")
    ap.add_argument("--classes", nargs="+", default=list(DEFAULT_CLASSES))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--style", default="legacy",
                    choices=["legacy", "separable"],
                    help="separable = unique hue x pattern per class, "
                         "low-overlap placements (for absolute-mAP runs)")
    args = ap.parse_args()

    for split, n, seed in (("train", args.train, args.seed),
                           ("test", args.test, args.seed + 1)):
        path = make_toy_dataset(
            args.out, num_images=n, classes=args.classes,
            image_size=(args.height, args.width), seed=seed, split=split,
            style=args.style,
        )
        print(f"{split}: {n} images -> {path}")


if __name__ == "__main__":
    main()
