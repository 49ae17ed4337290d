"""tools/voc_to_coco.py — the quick-start step-1 converter.

Synthesizes a minimal VOC devkit (XML annotations + split file + JPEGs)
and pins: 1-indexed-inclusive VOC corners -> COCO xywh, the difficult
filter (+ --keep_difficult), unknown-class skip, --link_images symlinks,
and that the output loads through data.coco.CocoJson.
"""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

XML = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""

OBJ = """<object>
  <name>{cls}</name><difficult>{diff}</difficult>
  <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
</object>"""


def _make_devkit(root):
    import cv2

    ann = os.path.join(root, "Annotations")
    sets = os.path.join(root, "ImageSets", "Main")
    jpg = os.path.join(root, "JPEGImages")
    for d in (ann, sets, jpg):
        os.makedirs(d)
    objs0 = (OBJ.format(cls="dog", diff=0, x1=11, y1=21, x2=110, y2=120)
             + OBJ.format(cls="cat", diff=1, x1=1, y1=1, x2=50, y2=50)
             + OBJ.format(cls="unicorn", diff=0, x1=5, y1=5, x2=9, y2=9))
    objs1 = OBJ.format(cls="person", diff=0, x1=1, y1=1, x2=320, y2=240)
    for name, objects in (("000001", objs0), ("000002", objs1)):
        with open(os.path.join(ann, name + ".xml"), "w") as f:
            f.write(XML.format(w=320, h=240, objects=objects))
        cv2.imwrite(os.path.join(jpg, name + ".jpg"),
                    np.zeros((240, 320, 3), np.uint8))
    with open(os.path.join(sets, "trainval.txt"), "w") as f:
        f.write("000001\n000002\n")


def _run(voc_root, out, *extra):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "voc_to_coco.py"),
         "--voc_root", voc_root, "--split", "trainval", "--out", out,
         *extra],
        check=True, capture_output=True)


def test_conversion_boxes_and_filters(tmp_path):
    voc = str(tmp_path / "VOC2007")
    _make_devkit(voc)
    out = str(tmp_path / "data" / "train.json")
    _run(voc, out)
    with open(out) as f:
        coco = json.load(f)
    assert len(coco["images"]) == 2
    assert len(coco["categories"]) == 20
    # difficult cat skipped, unknown class skipped -> dog + person remain
    anns = coco["annotations"]
    assert len(anns) == 2
    dog = anns[0]
    # VOC 1-indexed inclusive (11,21)-(110,120) -> xywh (10,20,100,100)
    assert dog["bbox"] == [10.0, 20.0, 100.0, 100.0]
    assert dog["area"] == 100.0 * 100.0
    # loads through the framework's COCO index with stable class naming
    sys.path.insert(0, REPO)
    from cl_object_detection_tpu.data.coco import CocoJson

    cj = CocoJson(out)
    names = set(cj.classes.values())
    assert {"dog", "person", "tvmonitor"} <= names


def test_keep_difficult_and_links(tmp_path):
    voc = str(tmp_path / "VOC2007")
    _make_devkit(voc)
    out = str(tmp_path / "data" / "train.json")
    _run(voc, out, "--keep_difficult", "--link_images")
    with open(out) as f:
        coco = json.load(f)
    assert len(coco["annotations"]) == 3  # difficult cat kept
    img_dir = os.path.join(os.path.dirname(out), "images")
    link = os.path.join(img_dir, "000001.jpg")
    assert os.path.islink(link) and os.path.exists(link)
    # re-running replaces links instead of crashing (moved-devkit case)
    _run(voc, out, "--link_images")
    assert os.path.exists(link)
