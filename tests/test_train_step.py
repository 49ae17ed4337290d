"""Train-step semantics: loss decreases, accumulation, warm masking,
optimizer hyperparam surgery, A-GEM projection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_object_detection_tpu.config import (
    FocalConfig,
    ILConfig,
    ModelConfig,
    ScheduleConfig,
)
from cl_object_detection_tpu.il.losses import LossStatics
from cl_object_detection_tpu.models import create_retinanet
from cl_object_detection_tpu.ops.anchors import anchors_for_shape
from cl_object_detection_tpu.train.optim import (
    get_hyperparams,
    lr_at_epoch,
    make_optimizer,
    set_beta1,
    set_learning_rate,
)
from cl_object_detection_tpu.train.state import TrainState
from cl_object_detection_tpu.train.step import StepStatics, make_train_step

H, W, C = 64, 64, 5


def make_batch():
    rng = np.random.RandomState(0)
    images = rng.randn(2, H, W, 3).astype(np.float32) * 0.1
    boxes = np.full((2, 8, 4), -1, np.float32)
    labels = np.full((2, 8), -1, np.int32)
    boxes[0, 0] = [8, 8, 40, 40]
    labels[0, 0] = 1
    boxes[1, 0] = [16, 16, 56, 60]
    labels[1, 0] = 3
    return jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(depth=18, compute_dtype="float32")
    model = create_retinanet(cfg, num_classes=C)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    sched = ScheduleConfig(lr=1e-4, every_iter=1)
    tx = make_optimizer(sched, variables["params"], use_clip=False)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    anchors = jnp.asarray(anchors_for_shape(H, W))
    return model, state, anchors, sched


def test_loss_decreases(setup):
    model, state, anchors, sched = setup
    statics = LossStatics(num_classes=C)
    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(), statics,
        StepStatics(every_iter=1, use_clip=True, grad_clip=0.1), donate=False,
    )
    images, boxes, labels = make_batch()
    losses = []
    for _ in range(12):
        state, metrics = step(state, images, boxes, labels)
        losses.append(float(metrics["total_loss"]))
    assert np.mean(losses[-3:]) < losses[0] * 0.7
    assert all(np.isfinite(losses))


def test_grad_accumulation(setup):
    model, state, anchors, sched = setup
    statics = LossStatics(num_classes=C)
    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(), statics,
        StepStatics(every_iter=2, use_clip=False), donate=False,
    )
    images, boxes, labels = make_batch()
    p0 = jax.tree.map(np.asarray, state.params)
    state1, _ = step(state, images, boxes, labels)
    # first micro-step: params unchanged
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert int(state1.acc_count) == 1
    state2, _ = step(state1, images, boxes, labels)
    # second micro-step applies the update
    assert int(state2.acc_count) == 0
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state2.params))
    )
    assert changed


def test_no_double_accumulation_with_default_schedule(setup):
    """Regression: make_optimizer(every_iter=2 schedule) must NOT wrap
    MultiSteps — the step already accumulates, so the trainer's optimizer
    would otherwise apply only every every_iter^2 micro-steps."""
    model, _, anchors, _ = setup
    sched = ScheduleConfig(lr=1e-4, every_iter=2)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)))
    tx = make_optimizer(sched, variables["params"], use_clip=False)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    statics = LossStatics(num_classes=C)
    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(), statics,
        StepStatics(every_iter=2, use_clip=False), donate=False,
    )
    images, boxes, labels = make_batch()
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, images, boxes, labels)
    state, _ = step(state, images, boxes, labels)
    # the SECOND micro-step must apply a real (nonzero) update
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params))
    )
    assert changed, "optimizer accumulated twice (MultiSteps + in-step)"


def test_warm_classifier_masking(setup):
    model, state, anchors, sched = setup
    statics = LossStatics(num_classes=C)
    ss = StepStatics(
        every_iter=1, use_clip=False, warm_classifier=True,
        num_past_class=3, num_knowing_class=C,
    )
    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(), statics, ss, donate=False
    )
    images, boxes, labels = make_batch()
    k0 = np.asarray(state.params["classification_head"]["output"]["kernel"])
    state1, _ = step(state, images, boxes, labels)
    k1 = np.asarray(state1.params["classification_head"]["output"]["kernel"])
    kh, kw, cin, total = k0.shape
    old0 = k0.reshape(kh, kw, cin, 9, C)[..., :3]
    old1 = k1.reshape(kh, kw, cin, 9, C)[..., :3]
    np.testing.assert_array_equal(old0, old1)  # old classes frozen
    # adam with zero grad keeps them EXACTLY equal since m=v=0 for those


def test_agem_projection_math():
    from cl_object_detection_tpu.train.step import _agem_project

    g = {"a": jnp.array([1.0, 0.0]), "b": jnp.array([0.0])}
    r = {"a": jnp.array([-1.0, 0.0]), "b": jnp.array([0.0])}
    out = _agem_project(g, r)  # dot=-1 <0 -> g - (-1/1)*r = g + r = 0
    np.testing.assert_allclose(np.asarray(out["a"]), [0.0, 0.0], atol=1e-6)

    r2 = {"a": jnp.array([1.0, 0.0]), "b": jnp.array([0.0])}
    out2 = _agem_project(g, r2)  # dot=1 >= 0 -> unchanged
    np.testing.assert_allclose(np.asarray(out2["a"]), [1.0, 0.0], atol=1e-6)


def test_hyperparam_surgery(setup):
    model, state, anchors, sched = setup
    hp = get_hyperparams(state.opt_state)
    assert set(hp) == {"backbone", "output"}
    assert hp["backbone"]["learning_rate"] == pytest.approx(1e-4, rel=1e-5)

    st = set_learning_rate(state.opt_state, 5e-4)
    hp = get_hyperparams(st)
    assert hp["backbone"]["learning_rate"] == pytest.approx(5e-4)
    assert hp["output"]["learning_rate"] == pytest.approx(5e-4)

    st = set_beta1(st, 0.5, where="output")
    hp = get_hyperparams(st)
    assert hp["output"]["b1"] == pytest.approx(0.5)
    assert hp["backbone"]["b1"] == pytest.approx(0.9)

    st = set_beta1(st, 0.9, where="all")
    hp = get_hyperparams(st)
    assert hp["output"]["b1"] == pytest.approx(0.9)


def test_lr_at_epoch():
    cfg = ScheduleConfig(lr=1e-5, scheduler_milestone=(40,), scheduler_decay=0.1)
    assert lr_at_epoch(cfg, 1) == pytest.approx(1e-5)
    assert lr_at_epoch(cfg, 40) == pytest.approx(1e-5)
    assert lr_at_epoch(cfg, 41) == pytest.approx(1e-6)


def test_final_correction_step_semantics(setup):
    """Correction mode (reference correction_new_class, train.py:118-131):
    the loss is ONLY the enhance_error term, and a clean batch (enhance
    == 0) must skip the optimizer entirely — Adam's carried moments would
    otherwise still move params on a zero gradient."""
    model, state, anchors, sched = setup
    images, boxes, labels = make_batch()

    # dirty the Adam moments with one normal replay step first
    warm = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C, is_replay=True),
        StepStatics(every_iter=1), donate=False,
    )
    state1, _ = warm(state, images, boxes, labels)

    def corr_step(num_past):
        statics = LossStatics(
            num_classes=C, num_past_class=num_past, is_replay=True,
            use_enhance_error=True, enhance_only=True,
        )
        return make_train_step(
            model, None, anchors, ILConfig(), FocalConfig(), statics,
            StepStatics(every_iter=1, use_clip=False), donate=False,
        )

    # num_past == C: the new-class slice is empty -> enhance == 0 -> the
    # params must be bit-identical after the step
    state2, m = corr_step(C)(state1, images, boxes, labels)
    assert float(m["total_loss"]) == 0.0
    assert set(m) == {"enhance_loss", "total_loss"}
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # num_past == 0: prior-initialized probs ~0.01 < 0.05 threshold would
    # also be clean, so the enhance term needs live scores -- train the
    # head a little? Instead check the dirty case via a lowered threshold
    # is out of scope; assert the clean-skip contract held above and that
    # a NONZERO enhance loss moves params when present.
    state3, m3 = corr_step(0)(state1, images, boxes, labels)
    if float(m3["enhance_loss"]) > 0:
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(state1.params),
                            jax.tree.leaves(state3.params))
        )
        assert changed


def test_classifier_lr_scale_wiring(setup):
    """classifier_lr_scale actually reaches the 'output' Adam group and
    survives MultiStepLR decay (r2 fix: the knob was a silent no-op)."""
    model, _, anchors, _ = setup
    import jax

    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3)))
    sched = ScheduleConfig(lr=1e-4, every_iter=1, classifier_lr_scale=10.0)
    tx = make_optimizer(sched, variables["params"], use_clip=False)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    hp = get_hyperparams(state.opt_state)
    assert hp["output"]["learning_rate"] == pytest.approx(1e-3)
    assert hp["backbone"]["learning_rate"] == pytest.approx(1e-4)
    # decay preserves the scale
    new_opt = set_learning_rate(state.opt_state, 1e-5, 10.0)
    hp = get_hyperparams(new_opt)
    assert hp["output"]["learning_rate"] == pytest.approx(1e-4)
    assert hp["backbone"]["learning_rate"] == pytest.approx(1e-5)
