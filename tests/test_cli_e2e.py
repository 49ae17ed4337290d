"""End-to-end CLI surface test: train -> validate -> detect through the
ACTUAL entry points (``cli.train.main`` / ``cli.validate.main`` /
``cli.detect.main``), not the library API.

The integration tests exercise ``train_process``/``Evaluator`` directly;
this file pins the user-facing wiring on top — flag parsing,
``args_to_config``, root-layout dataset resolution, checkpoint layout,
result JSON/CSV writing, and detection image output — on a tiny toy run
(reference flow: main.py:207-235 then validation.py:107 then
visualize_single_image.py).
"""
import json
import os
from glob import glob

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    """Train 2 epochs on a 10-image 5-class toy set via cli.train.main."""
    from cl_object_detection_tpu.cli.train import main as train_main
    from cl_object_detection_tpu.utils.toydata import make_toy_dataset

    root = str(tmp_path_factory.mktemp("cli_e2e"))
    data = os.path.join(root, "toy")
    make_toy_dataset(data, num_images=10, image_size=(48, 64), seed=0,
                     split="train")
    make_toy_dataset(data, num_images=6, image_size=(48, 64), seed=1,
                     split="test")
    args = [
        "--root_dir", root, "--dataset", "toy",
        "--train_json", os.path.join(data, "train.json"),
        "--test_json", os.path.join(data, "test.json"),
        "--image_dir", os.path.join(data, "images"),
        "--scenario", "5", "--end_epoch", "2", "--depth", "18",
        "--pretrained", "none", "--image_height", "64",
        "--image_width", "64", "--batch_size", "2", "--every_iter", "1",
        "--record", "false", "--lr", "1e-4",
    ]
    train_main(args)
    return root, data, args


def test_train_cli_writes_checkpoints_and_params(run):
    root, _data, _args = run
    state_dir = os.path.join(root, "checkpoint", "5", "state0")
    assert os.path.isdir(state_dir)
    with open(os.path.join(state_dir, "params.json")) as f:
        cfg = json.load(f)
    assert cfg["model"]["depth"] == 18
    assert cfg["data"]["height"] == 64
    # epochs 1 and 2 both saved (save_every default 1)
    from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(root, "checkpoint"), ["5"])
    assert set(ckpt.epochs(0)) == {1, 2}


def test_validate_cli_writes_results_and_csv(run):
    root, _data, args = run
    from cl_object_detection_tpu.cli.validate import get_parser, run_validation

    a = get_parser().parse_args(args + ["--state", "0", "--epoch", "2",
                                        "--threshold", "0.0"])
    results = run_validation(a)
    assert 2 in results
    assert np.isfinite(results[2].mean_ap50)
    result_dir = os.path.join(root, "val_result", "5", "state0")
    assert os.path.exists(
        os.path.join(result_dir, "toy_results_epoch2.json"))
    csvs = glob(os.path.join(result_dir, "val_result_*.csv"))
    assert csvs, "decline CSV missing"


def test_validate_cli_folder_management(run):
    """--new_folder/--specific_folder nest the run's outputs in their own
    subfolder and --output_csv false skips the CSV (reference
    validation.py:35-40, evaluator.py:36-41, 278-280)."""
    root, _data, args = run
    from cl_object_detection_tpu.cli.validate import get_parser, run_validation

    a = get_parser().parse_args(args + [
        "--state", "0", "--epoch", "2", "--threshold", "0.0",
        "--new_folder", "true", "--specific_folder", "runA",
        "--output_csv", "false",
    ])
    results = run_validation(a)
    sub = os.path.join(root, "val_result", "5", "state0", "runA")
    assert os.path.exists(os.path.join(sub, "toy_results_epoch2.json"))
    assert not glob(os.path.join(sub, "val_result_*.csv"))
    assert 2 in results

    # --just_val re-scores the cached rows from the SAME named folder
    # (the reference's reuse pattern for a specific_folder), now with CSV
    a2 = get_parser().parse_args(args + [
        "--state", "0", "--epoch", "2", "--threshold", "0.0",
        "--new_folder", "true", "--specific_folder", "runA",
        "--just_val", "true",
    ])
    results2 = run_validation(a2)
    assert results2[2].mean_ap50 == results[2].mean_ap50
    assert glob(os.path.join(sub, "val_result_*.csv"))


def test_detect_cli_draws_boxes(run, tmp_path):
    root, data, _args = run
    from cl_object_detection_tpu.cli.detect import main as detect_main

    out_dir = str(tmp_path / "det")
    detect_main([
        "--image_dir", os.path.join(data, "images"),
        "--train_json", os.path.join(data, "train.json"),
        "--root_dir", root, "--scenario", "5", "--state", "0",
        "--epoch", "2", "--depth", "18", "--score_thresh", "0.0",
        "--out_dir", out_dir,
    ])
    outs = glob(os.path.join(out_dir, "*"))
    assert outs, "no detection images written"
