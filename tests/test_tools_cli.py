"""Smoke the thin inspection/setup CLIs under tools/ as subprocesses:
make_toy_dataset (dataset provisioning) and coco_tool (the reference's
Enhance_COCO query surface, enhance_coco.py:82-121)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    r = subprocess.run([sys.executable, *args], check=True,
                       capture_output=True, text=True, cwd=REPO)
    return r.stdout


def test_make_toy_dataset_and_coco_tool(tmp_path):
    out = str(tmp_path / "toy")
    _run("tools/make_toy_dataset.py", "--out", out, "--train", "6",
         "--test", "3")
    train_json = os.path.join(out, "train.json")
    assert os.path.exists(train_json)
    assert os.path.exists(os.path.join(out, "test.json"))
    with open(train_json) as f:
        coco = json.load(f)
    assert len(coco["images"]) == 6

    stats = _run("tools/coco_tool.py", "stats", train_json)
    assert "6 images" in stats
    classes = _run("tools/coco_tool.py", "classes", train_json)
    assert len(classes.strip().splitlines()) == len(coco["categories"])
    name = coco["categories"][0]["name"]
    by_cat = _run("tools/coco_tool.py", "imgs-by-cat", train_json,
                  "--cats", name)
    assert "images:" in by_cat
    by_img = _run("tools/coco_tool.py", "cats-by-img", train_json,
                  "--imgs", str(coco["images"][0]["id"]))
    assert ":" in by_img


def test_multiseed_summary_parses_r4_artifacts():
    """tools/multiseed_summary.py aggregates the committed r4 artifacts
    into the mean+/-spread tables (campaign_r5.sh phase 5)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiseed_summary.py"),
         "--r4_summary",
         os.path.join(REPO, "measurements", "r4", "forgetting_summary.txt"),
         "--r4_battery",
         os.path.join(REPO, "measurements", "r4", "battery.log")],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    assert "forgetting ablation" in out and "A/B battery" in out
    # seed-0 rows parsed: the known r4 numbers appear
    assert "0.629" in out      # full battery old-mAP50
    assert "+0.136" in out     # SCAIL delta
    assert "0.8828" in out     # battery 608x832 row
