"""Smoke for the outcome-level cross-framework A/B harness.

tools/reference_ab.py drives the reference's OWN ``train_process`` on CPU
torch (data layer bridged to our BatchLoader) against this framework and
scores both with one evaluator. The real measurement runs at real epochs
(measurements/r5/reference_ab_seed0.json); this test pins the HARNESS:
both sides train end-to-end at 1 epoch in a subprocess and the delta
JSON comes out well-formed.
"""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_ab_harness(tmp_path):
    out = str(tmp_path / "ab")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "reference_ab.py"),
         "--out", out, "--epochs0", "1", "--epochs1", "1",
         "--train_images", "14", "--test_images", "8", "--batch", "2",
         "--size", "64"],
        capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "reference_ab.json")) as f:
        res = json.load(f)
    for side in ("ours", "reference"):
        assert set(res[side]["per_class"]) == {f"cls{i}" for i in range(5)}
        assert np.isfinite(res[side]["mAP50_all"])
        assert res[side]["train_wall_s"] > 0
    assert set(res["delta_ours_minus_ref"]) == {
        "mAP50_all", "mAP50_old", "mAP50_new"}
    # the reference side really ran its own loop: its saved final .pt
    # exists and the log shows the replay pass
    assert os.path.exists(os.path.join(out, "ref", "final_state1.pt"))
    assert "Start Replay!" in r.stdout
