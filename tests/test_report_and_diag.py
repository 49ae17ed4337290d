"""Decline CSV report + classifier diagnostics + notebook helper."""
import os

import numpy as np

from cl_object_detection_tpu.eval.coco_eval import EvalResult
from cl_object_detection_tpu.eval.report import (
    decline_csv,
    load_upper_bound,
    save_upper_bound,
)
from cl_object_detection_tpu.utils.notebook import text_to_args


def make_result(ap):
    r = EvalResult()
    r.ap50 = {"a": ap, "b": ap / 2}
    r.recall = {"a": ap, "b": ap}
    r.pred_num = 10
    r.real_num = 5
    return r


def test_upper_bound_roundtrip(tmp_path):
    path = str(tmp_path / "ub.json")
    save_upper_bound(path, make_result(0.8))
    ub = load_upper_bound(path)
    assert ub["a"]["ap"] == 0.8
    assert ub["mean"]["ap"] == np.mean([0.8, 0.4])
    assert ub["pred_ratio"] == 2.0


def test_decline_csv(tmp_path):
    ub_path = str(tmp_path / "ub.json")
    save_upper_bound(ub_path, make_result(0.8))
    results = {10: make_result(0.6), 20: make_result(0.7)}
    out = str(tmp_path / "r.csv")
    text = decline_csv(results, ["a", "b"], num_old_classes=1,
                       upper_bound=load_upper_bound(ub_path), out_path=out)
    lines = text.splitlines()
    assert lines[0] == "Epoch,10,10,10,10,20,20,20,20"
    assert lines[1].startswith(",AP,Recall,AP_decline,Recall_decline")
    # class a at epoch 10: decline = 0.8 - 0.6 = 20.0%
    assert "20.0%" in lines[2]
    assert lines[4].startswith("Mean")
    assert lines[5].startswith("Sum_decline")
    assert os.path.exists(out)


def test_diagnostics(tmp_path):
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import ModelConfig
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.utils.diagnostics import (
        classifier_weight_norms,
        plot_classifier_diagnostics,
    )

    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    norms = classifier_weight_norms(v["params"])
    assert norms.shape == (4,)
    out = str(tmp_path / "diag.png")
    plot_classifier_diagnostics(v["params"], ["w", "x", "y", "z"], 2, out)
    assert os.path.exists(out)


def test_text_to_args():
    assert text_to_args("--scenario 15 1 \n --distill true") == [
        "--scenario", "15", "1", "--distill", "true",
    ]


def test_decline_excludes_no_gt_sentinel(tmp_path):
    """-1.0 (class absent from the split) stays visible in the AP column
    but must not inflate Sum_decline (+100%/class) nor persist into the
    upper bound (r2 fix)."""
    ub_path = str(tmp_path / "ub.json")
    ub_res = make_result(0.8)
    ub_res.ap50["b"] = -1.0          # absent at upper-bound time
    save_upper_bound(ub_path, ub_res)
    ub = load_upper_bound(ub_path)
    assert "b" not in ub             # sentinel not persisted

    res = make_result(0.6)
    res.ap50["a"] = -1.0             # old class absent at eval time
    res.recall["a"] = -1.0
    text = decline_csv({10: res}, ["a", "b"], num_old_classes=2,
                       upper_bound=ub)
    sum_line = [l for l in text.splitlines()
                if l.startswith("Sum_decline")][0]
    # only class b contributes: ub has no entry for it (absent), so its
    # ub_ap is 0.0 -> decline = 0.0 - 0.3 = -30%; class a's sentinel
    # (0.8 - (-1.0) = +180%) must NOT appear
    assert "180.0%" not in sum_line
