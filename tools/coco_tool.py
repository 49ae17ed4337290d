#!/usr/bin/env python
"""COCO-json inspection CLI — the reference's Enhance_COCO tooling surface
(/root/reference/preprocessing/enhance_coco.py:82-121) as a command:

    python tools/coco_tool.py stats     path/to/annotations.json
    python tools/coco_tool.py classes   path/to/annotations.json
    python tools/coco_tool.py imgs-by-cat  path.json --cats dog cat
    python tools/coco_tool.py cats-by-img  path.json --imgs 1 2 3
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cl_object_detection_tpu.data.coco import CocoJson


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["stats", "classes", "imgs-by-cat", "cats-by-img"])
    p.add_argument("json_path")
    p.add_argument("--cats", nargs="*", default=[])
    p.add_argument("--imgs", nargs="*", type=int, default=[])
    a = p.parse_args()

    coco = CocoJson(a.json_path)
    if a.cmd == "stats":
        print(coco.stats_frame().to_string())
        print(f"\ntotal: {len(coco.imgs)} images, {len(coco.anns)} objects, "
              f"{len(coco.cats)} classes")
    elif a.cmd == "classes":
        for cid in sorted(coco.classes):
            print(f"{cid:4d}  {coco.classes[cid]}")
    elif a.cmd == "imgs-by-cat":
        ids = coco.cat_name_to_id(a.cats)
        out = coco.get_imgs_by_cats(ids)
        print(f"{len(out)} images:", out[:50], "..." if len(out) > 50 else "")
    elif a.cmd == "cats-by-img":
        out = coco.get_cats_by_imgs(a.imgs)
        print([f"{c}:{coco.classes[c]}" for c in out])


if __name__ == "__main__":
    main()
