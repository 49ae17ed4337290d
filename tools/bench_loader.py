"""Host input-pipeline throughput: can the loader feed the chips?

    python tools/bench_loader.py [--images 96] [--batch 8] [--workers N]
           [--height 375 --width 500] [--shape_buckets 608x832]

Measures decode + resize/pad + augment + collate images/sec through the
REAL train-path loader (data/loader.BatchLoader with its threaded
prefetch) over a synthetic VOC-shaped JPEG set, steady-state (epoch 2+,
page cache warm). Device work is excluded — this is the host side only.

Why it matters: the train step measures compute-bound 142 img/s/chip at
608x832 (tools/bench_train.py), so a v5e-8 needs ~1.1k img/s of decode.
This tool gives img/s per host core; production TPU hosts have 100+
cores and the loader's decode workers scale across them
(`DataConfig.num_workers`), so the required worker count = target /
(per-core rate) is the capacity-planning output printed here.
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=0,
                    help="decode worker threads (0 = in-line)")
    ap.add_argument("--height", type=int, default=375,
                    help="source image height (VOC-typical 375x500)")
    ap.add_argument("--width", type=int, default=500)
    ap.add_argument("--shape_buckets", default="608x832",
                    help="extra canonical frames, comma-separated HxW "
                         "('' = landscape/portrait defaults only)")
    ap.add_argument("--epochs", type=int, default=3,
                    help="total epochs; epoch 1 warms the page cache and "
                         "is excluded from the rate")
    ap.add_argument("--target", type=float, default=142.3 * 8,
                    help="device-side img/s the pipeline must sustain "
                         "(default: the measured 608x832 train rate x8 "
                         "chips)")
    a = ap.parse_args()

    from cl_object_detection_tpu.config import DataConfig
    from cl_object_detection_tpu.data import BatchLoader, CocoJson, ILDataset
    from cl_object_detection_tpu.states import ILStates
    from cl_object_detection_tpu.utils.toydata import (DEFAULT_CLASSES,
                                                       make_toy_dataset)

    root = tempfile.mkdtemp(prefix="bench_loader_")
    json_path = make_toy_dataset(root, num_images=a.images,
                                 image_size=(a.height, a.width), seed=0)
    coco = CocoJson(json_path)
    states = ILStates(list(DEFAULT_CLASSES), coco.classes_inverse, [5])
    ds = ILDataset(coco, states, root + "/images", split="train")
    buckets = tuple(
        tuple(int(d) for d in b.split("x"))
        for b in a.shape_buckets.split(",") if b
    )
    cfg = DataConfig(batch_size=a.batch, shape_buckets=buckets)
    loader = BatchLoader(ds, cfg, shuffle=True, augment=True,
                         num_workers=a.workers)

    n_img = 0
    t0 = None
    for epoch in range(a.epochs):
        loader.set_epoch(epoch)
        for batch in loader:
            if t0 is not None:
                n_img += batch.images.shape[0]
        if epoch == 0:
            t0 = time.perf_counter()  # exclude the cache-cold first epoch
    dt = time.perf_counter() - t0
    rate = n_img / dt
    print(json.dumps({
        "metric": "host_loader_images_per_sec",
        "value": round(rate, 2),
        "unit": "images/sec (this host)",
        "workers": a.workers,
        "source_size": f"{a.height}x{a.width}",
        "frames": [f"{h}x{w}" for h, w in buckets] or "defaults",
        "target_device_img_per_s": a.target,
        "cores_needed_at_this_rate": round(a.target / rate, 1),
    }))


if __name__ == "__main__":
    main()
