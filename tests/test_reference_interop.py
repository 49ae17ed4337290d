"""Reference-artifact interop beyond model weights.

A half-finished reference experiment must be continuable here:
  (a) ``models.convert.load_reference_optimizer`` grafts the reference
      checkpoint's Adam moments (``optimizer_state_dict``,
      /root/reference/preprocessing/params.py:307-322) and its
      MultiStepLR learning rate into our optax state — asserted
      moment-for-moment against the actual torch Adam below;
  (b) ``ILTrainer`` wires it: ``--torch_ckpt`` on a same-state resume
      (``--start_epoch > 1``) restores weights + optimizer memory
      (reference main.py:70-71 semantics);
  (c) ``eval.report.load_upper_bound`` falls back to a reference
      ``upper_bound.pickle`` (/root/reference/evaluator.py:91-92) so
      decline CSVs keep their per-class baselines.
"""
import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo absent"
)


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.nms = lambda *a, **k: torch.zeros(0, dtype=torch.long)
    ops.batched_nms = lambda *a, **k: torch.zeros(0, dtype=torch.long)
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


_install_torchvision_stub()
sys.path.insert(0, REF)
try:
    from retinanet import model as ref_model
finally:
    sys.path.remove(REF)

NUM_CLASSES = 5
LR = 1e-4


@pytest.fixture(scope="module")
def ref_checkpoint(tmp_path_factory):
    """A reference-format .pt: 3 Adam steps with the reference's exact
    two-group construction (main.py:57-62), then MultiStepLR stepped past
    its milestone (gamma 0.1) — saved with params.py:307-322's keys."""
    torch.manual_seed(0)
    tm = ref_model.create_retinanet(18, num_classes=NUM_CLASSES,
                                    pretrained=False)
    grp0 = [p for n, p in tm.named_parameters()
            if "classificationModel.output" not in n]
    opt = torch.optim.Adam(
        [{"params": grp0},
         {"params": tm.classificationModel.output.parameters()}], lr=LR)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[2],
                                                 gamma=0.1)
    gen = torch.Generator().manual_seed(7)
    for _ in range(3):
        for p in tm.parameters():
            p.grad = torch.randn(p.shape, generator=gen)
        opt.step()
        sched.step()
    path = str(tmp_path_factory.mktemp("refckpt") / "state0_epoch3.pt")
    torch.save({"epoch": 3,
                "model_state_dict": tm.state_dict(),
                "optimizer_state_dict": opt.state_dict(),
                "scheduler_state_dict": sched.state_dict(),
                "loss_hist": [1.0, 0.9, 0.8]}, path)
    return tm, opt, path


def _find_adam_states(node, out):
    if hasattr(node, "_fields"):
        if {"count", "mu", "nu"} <= set(node._fields):
            out.append(node)
            return
        for f in node._fields:
            _find_adam_states(getattr(node, f), out)
    elif isinstance(node, dict):
        for v in node.values():
            _find_adam_states(v, out)
    elif isinstance(node, (tuple, list)):
        for v in node:
            _find_adam_states(v, out)


def _merged_moment(adam_states, attr, path):
    """Fetch moment leaf at flax ``path`` from whichever group owns it
    (the other group holds a MaskedNode there)."""
    import optax

    for st in adam_states:
        node = getattr(st, attr)
        for p in path:
            node = node[p]
        if not isinstance(node, optax.MaskedNode):
            return np.asarray(node)
    raise AssertionError(f"no group owns {path}")


def test_optimizer_import_matches_torch_adam(ref_checkpoint):
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import ScheduleConfig
    from cl_object_detection_tpu.models.convert import (
        load_reference_checkpoint,
        load_reference_optimizer,
    )
    from cl_object_detection_tpu.models.retinanet import RetinaNet
    from cl_object_detection_tpu.train.optim import (
        get_hyperparams,
        make_optimizer,
    )

    tm, opt, path = ref_checkpoint
    jm = RetinaNet(depth=18, num_classes=NUM_CLASSES, dtype=jnp.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    variables = load_reference_checkpoint(variables, path, strict=True,
                                          allow_pickle=True)
    tx = make_optimizer(ScheduleConfig(lr=LR), variables["params"],
                        use_clip=False)
    opt_state = tx.init(variables["params"])

    # this torch's weights_only allowlist accepts the scheduler state, so
    # no unpickling opt-in is needed (the allow_pickle gate still guards
    # older formats that serialize richer scheduler objects)
    new_state, info = load_reference_optimizer(
        opt_state, variables["params"], path)
    assert info["step"] == 3
    assert info["last_lr"] == pytest.approx(LR * 0.1)
    assert info["skipped"] == []

    # scheduler LR applied to both groups (reference keeps one LR)
    hp = get_hyperparams(new_state)
    assert hp["backbone"]["learning_rate"] == pytest.approx(LR * 0.1)
    assert hp["output"]["learning_rate"] == pytest.approx(LR * 0.1)

    adam_states = []
    _find_adam_states(new_state, adam_states)
    assert len(adam_states) == 2  # one per reference param group
    for st in adam_states:
        assert int(st.count) == 3

    # moment-for-moment vs the live torch optimizer, both groups + both
    # layouts (4D conv transposes OIHW->HWIO, 1D bias passes through)
    torch_state = {n: opt.state[p] for n, p in tm.named_parameters()}
    checks = [
        ("conv1.weight", ("backbone", "conv1", "kernel"), True),
        ("layer1.0.conv2.weight",
         ("backbone", "layer1_0", "conv2", "kernel"), True),
        ("classificationModel.output.weight",
         ("classification_head", "output", "kernel"), True),
        ("classificationModel.output.bias",
         ("classification_head", "output", "bias"), False),
        ("regressionModel.conv1.weight",
         ("regression_head", "conv1", "kernel"), True),
    ]
    for tname, jpath, is_conv in checks:
        for tkey, attr in (("exp_avg", "mu"), ("exp_avg_sq", "nu")):
            want = torch_state[tname][tkey].numpy()
            if is_conv:
                want = want.transpose(2, 3, 1, 0)
            got = _merged_moment(adam_states, attr, jpath)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_trainer_resumes_reference_experiment(ref_checkpoint, tmp_path):
    """--torch_ckpt + --start_epoch 3: ILTrainer restores reference weights
    AND Adam memory with no native checkpoint present."""
    import jax.numpy as jnp

    from cl_object_detection_tpu.train.trainer import ILTrainer
    from cl_object_detection_tpu.utils.toydata import make_toy_dataset
    from test_integration import tiny_cfg

    tm, opt, path = ref_checkpoint
    root = str(tmp_path / "toy")
    make_toy_dataset(root, num_images=6, seed=1, split="train")
    cfg = tiny_cfg(str(tmp_path), ["5"]).replace(
        start_epoch=3, end_epoch=3, torch_ckpt=path, trust_torch_ckpt=True)
    trainer = ILTrainer(cfg, os.path.join(root, "train.json"),
                        os.path.join(root, "images"),
                        workdir=str(tmp_path))

    want = tm.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(trainer.train_state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    adam_states = []
    _find_adam_states(trainer.train_state.opt_state, adam_states)
    assert adam_states and all(int(s.count) == 3 for s in adam_states)
    mu = _merged_moment(adam_states, "mu", ("backbone", "conv1", "kernel"))
    want_mu = opt.state[tm.conv1.weight]["exp_avg"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(mu, want_mu, rtol=1e-6, atol=1e-7)


def test_upper_bound_pickle_fallback(tmp_path):
    """load_upper_bound reads a reference upper_bound.pickle when the JSON
    is absent, normalized (mean row computed, declines class-for-class)."""
    from cl_object_detection_tpu.eval.report import load_upper_bound

    val_dir = tmp_path / "val_result"
    val_dir.mkdir()
    ref = {"aeroplane": {"ap": np.float64(0.7), "recall": np.float64(0.9)},
           "bicycle": {"ap": 0.5, "recall": 0.6}}
    with open(val_dir / "upper_bound.pickle", "wb") as f:
        pickle.dump(ref, f)

    ub = load_upper_bound(str(val_dir / "upper_bound.json"))
    assert ub["aeroplane"] == {"ap": 0.7, "recall": 0.9}
    assert ub["bicycle"] == {"ap": 0.5, "recall": 0.6}
    assert ub["mean"]["ap"] == pytest.approx(0.6)
    assert ub["mean"]["recall"] == pytest.approx(0.75)

    # the JSON (our native format) still wins when both exist
    import json
    with open(val_dir / "upper_bound.json", "w") as f:
        json.dump({"aeroplane": {"ap": 0.1, "recall": 0.2}}, f)
    assert load_upper_bound(str(val_dir / "upper_bound.json")) == {
        "aeroplane": {"ap": 0.1, "recall": 0.2}}
