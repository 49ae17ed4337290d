#!/usr/bin/env python
"""Convert a PASCAL-VOC devkit split to the COCO-json layout this framework
(and the reference) trains from.

The reference assumes VOC2007 already converted to COCO json under
root/dataset (README.md:1-28); this tool performs that conversion:

    python tools/voc_to_coco.py --voc_root VOCdevkit/VOC2007 \
        --split trainval --out mydata/voc2007/train.json
    python tools/voc_to_coco.py --voc_root VOCdevkit/VOC2007 \
        --split test --out mydata/voc2007/test.json --link_images

Annotations parse from Annotations/*.xml; boxes convert from VOC's
1-indexed inclusive corners to COCO xywh.
"""
import argparse
import json
import os
import xml.etree.ElementTree as ET

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--voc_root", required=True, help="e.g. VOCdevkit/VOC2007")
    p.add_argument("--split", default="trainval",
                   help="ImageSets/Main/<split>.txt")
    p.add_argument("--out", required=True)
    p.add_argument("--keep_difficult", action="store_true")
    p.add_argument("--link_images", action="store_true",
                   help="symlink JPEGImages into <out_dir>/images/")
    a = p.parse_args()

    split_file = os.path.join(a.voc_root, "ImageSets", "Main", a.split + ".txt")
    with open(split_file) as f:
        names = [line.strip().split()[0] for line in f if line.strip()]

    cat_of = {n: i + 1 for i, n in enumerate(VOC_CLASSES)}
    images, annotations = [], []
    ann_id = 1
    for img_idx, name in enumerate(names, start=1):
        xml_path = os.path.join(a.voc_root, "Annotations", name + ".xml")
        root = ET.parse(xml_path).getroot()
        size = root.find("size")
        w = int(size.find("width").text)
        h = int(size.find("height").text)
        images.append(
            {"id": img_idx, "file_name": name + ".jpg", "height": h, "width": w}
        )
        for obj in root.findall("object"):
            difficult = int((obj.find("difficult").text or "0")) \
                if obj.find("difficult") is not None else 0
            if difficult and not a.keep_difficult:
                continue
            cls = obj.find("name").text.strip()
            if cls not in cat_of:
                continue
            bb = obj.find("bndbox")
            x1 = float(bb.find("xmin").text) - 1
            y1 = float(bb.find("ymin").text) - 1
            x2 = float(bb.find("xmax").text)
            y2 = float(bb.find("ymax").text)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_idx,
                    "category_id": cat_of[cls],
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 0,
                }
            )
            ann_id += 1

    categories = [
        {"id": i + 1, "name": n, "supercategory": "voc"}
        for i, n in enumerate(VOC_CLASSES)
    ]
    out_dir = os.path.dirname(os.path.abspath(a.out))
    os.makedirs(out_dir, exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": categories},
            f,
        )
    print(f"{a.out}: {len(images)} images, {len(annotations)} boxes")

    if a.link_images:
        img_dir = os.path.join(out_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        src_dir = os.path.abspath(os.path.join(a.voc_root, "JPEGImages"))
        for name in names:
            dst = os.path.join(img_dir, name + ".jpg")
            # lexists: a DANGLING symlink (moved devkit) must be replaced,
            # not crash os.symlink with FileExistsError
            if os.path.lexists(dst):
                os.unlink(dst)
            os.symlink(os.path.join(src_dir, name + ".jpg"), dst)
        print(f"linked images into {img_dir}")


if __name__ == "__main__":
    main()
