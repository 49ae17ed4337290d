"""Synthetic COCO-json toy dataset for tests / smoke training.

The reference has no test fixtures at all (SURVEY.md §4); this generates a
tiny deterministic VOC-like dataset — colored rectangles on noise
backgrounds, one JSON per split — so every pipeline stage (dataset ->
loader -> train -> eval) can run hermetically.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_CLASSES = ("circleish", "square", "wide", "tall", "tiny")


def make_toy_dataset(
    root: str,
    num_images: int = 16,
    classes: Sequence[str] = DEFAULT_CLASSES,
    image_size: Tuple[int, int] = (240, 320),   # (h, w); some get transposed
    max_objects: int = 3,
    seed: int = 0,
    split: str = "train",
) -> str:
    """Writes images/ + annotations JSON under root; returns the JSON path."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    images, annotations = [], []
    categories = [
        {"id": i + 1, "name": n, "supercategory": "toy"}
        for i, n in enumerate(classes)
    ]
    ann_id = 1
    for idx in range(num_images):
        h, w = image_size if idx % 3 else (image_size[1], image_size[0])
        img = (rng.rand(h, w, 3) * 40).astype(np.uint8)
        # the first 2*C images are single-object single-class (class idx % C)
        # so exemplar/replay sampling always has class-exclusive images
        exclusive = idx < 2 * len(classes)
        n_obj = 1 if exclusive else rng.randint(1, max_objects + 1)
        img_id = idx + 1
        for _ in range(n_obj):
            cls = idx % len(classes) if exclusive else int(rng.randint(0, len(classes)))
            bw = int(rng.randint(30, max(31, w // 2)))
            bh = int(rng.randint(30, max(31, h // 2)))
            x = int(rng.randint(0, max(1, w - bw)))
            y = int(rng.randint(0, max(1, h - bh)))
            color = np.zeros(3, np.uint8)
            # clamp: >17 classes would wrap uint8 (260 -> 4) and produce
            # near-invisible boxes; keep the per-class shade distinct below
            color[cls % 3] = min(255, 200 + 10 * (cls // 3))
            if cls // 3 >= 6:  # distinguish clamped classes via 2nd channel
                # cycle in [60, 250] so classes beyond ~30 stay distinct
                # instead of all clamping to 255
                color[(cls + 1) % 3] = 60 + (20 * (cls // 3)) % 191
            img[y : y + bh, x : x + bw] = color
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": cls + 1,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        fname = f"{split}_{img_id:04d}.jpg"
        _save_jpeg(os.path.join(img_dir, fname), img)
        images.append(
            {"id": img_id, "file_name": fname, "height": h, "width": w}
        )

    data = {"images": images, "annotations": annotations, "categories": categories}
    json_path = os.path.join(root, f"{split}.json")
    with open(json_path, "w") as f:
        json.dump(data, f)
    return json_path


def _save_jpeg(path: str, img: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, img[:, :, ::-1])
    except Exception:
        from PIL import Image

        Image.fromarray(img).save(path)
