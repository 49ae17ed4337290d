"""Data-parallel train step over a virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_object_detection_tpu.config import (
    FocalConfig,
    ILConfig,
    MeshConfig,
    ModelConfig,
    ScheduleConfig,
)
from cl_object_detection_tpu.il.losses import LossStatics
from cl_object_detection_tpu.models import create_retinanet
from cl_object_detection_tpu.ops.anchors import anchors_for_shape
from cl_object_detection_tpu.parallel import create_mesh, data_sharding, replicate, shard_batch
from cl_object_detection_tpu.train.optim import make_optimizer
from cl_object_detection_tpu.train.state import TrainState
from cl_object_detection_tpu.train.step import StepStatics, make_train_step

H, W, C = 64, 64, 4


def test_eight_device_mesh_exists():
    assert len(jax.devices()) == 8


def test_data_parallel_train_step():
    mesh = create_mesh(MeshConfig())
    assert mesh.shape["data"] == 8

    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), C)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    tx = make_optimizer(ScheduleConfig(lr=1e-4, every_iter=1), variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    # replicate state, shard batch over 'data'
    state = jax.device_put(state, replicate(mesh))
    anchors = jax.device_put(jnp.asarray(anchors_for_shape(H, W)), replicate(mesh))

    rng = np.random.RandomState(0)
    images = rng.randn(8, H, W, 3).astype(np.float32) * 0.1
    boxes = np.full((8, 4, 4), -1, np.float32)
    labels = np.full((8, 4), -1, np.int32)
    for i in range(8):
        boxes[i, 0] = [8, 8, 40, 40]
        labels[i, 0] = i % C
    batch = shard_batch(mesh, {"images": images, "boxes": boxes, "labels": labels})
    assert batch["images"].sharding.spec[0] == "data"

    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C), StepStatics(every_iter=1), donate=False,
    )
    state2, metrics = step(state, batch["images"], batch["boxes"], batch["labels"])
    assert np.isfinite(float(metrics["total_loss"]))
    # params stay replicated after the update
    k = state2.params["classification_head"]["output"]["kernel"]
    assert k.sharding.is_fully_replicated


def test_sharded_matches_single_device():
    """Same batch: sharded-mean loss == unsharded loss (psum correctness)."""
    mesh = create_mesh(MeshConfig())
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), C)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)))
    tx = make_optimizer(ScheduleConfig(lr=1e-4, every_iter=1), variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    anchors = jnp.asarray(anchors_for_shape(H, W))

    rng = np.random.RandomState(1)
    images = rng.randn(8, H, W, 3).astype(np.float32) * 0.1
    boxes = np.full((8, 4, 4), -1, np.float32)
    labels = np.full((8, 4), -1, np.int32)
    boxes[:, 0] = [10, 10, 50, 50]
    labels[:, 0] = 1

    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C), StepStatics(every_iter=1), donate=False,
    )
    _, m_plain = step(state, jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels))

    state_r = jax.device_put(state, replicate(mesh))
    batch = shard_batch(mesh, {"images": images, "boxes": boxes, "labels": labels})
    _, m_shard = step(state_r, batch["images"], batch["boxes"], batch["labels"])

    np.testing.assert_allclose(
        float(m_plain["total_loss"]), float(m_shard["total_loss"]), rtol=1e-5
    )


def test_global_batch_from_local_single_process():
    """Single-process, make_array_from_process_local_data == shard_batch
    (the multi-host data-loading path, SURVEY.md §2.3)."""
    from cl_object_detection_tpu.parallel import (
        global_batch_from_local,
        init_distributed,
        shard_batch,
    )

    init_distributed(num_processes=1)  # must be a no-op
    mesh = create_mesh(MeshConfig())
    rng = np.random.RandomState(0)
    batch = {"images": rng.randn(8, 16, 16, 3).astype(np.float32),
             "labels": rng.randint(0, 5, (8, 4)).astype(np.int32)}
    a = global_batch_from_local(mesh, batch)
    b = shard_batch(mesh, batch)
    for k in batch:
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_sharded_predict_matches_single_device():
    """DP eval over the mesh == plain jit eval, detection for detection."""
    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.eval.predictor import (
        make_predict_fn,
        make_sharded_predict_fn,
    )

    mesh = create_mesh(MeshConfig())
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
    cfg = PredictConfig(pre_nms_topk=256, nms_impl="iterative")

    ref = make_predict_fn(model, cfg)(variables, images)
    out = make_sharded_predict_fn(model, cfg, mesh)(variables, images)

    np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(out.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.boxes), np.asarray(out.boxes),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))


def test_sharded_predict_with_bic_matches_single_device():
    """BiC correction composes with DP eval: sharded+corrected == plain
    jit+corrected, and the correction provably changes scores."""
    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.eval.predictor import (
        make_predict_fn,
        make_sharded_predict_fn,
    )
    from cl_object_detection_tpu.il.bic import bic_correct_from_meta

    mesh = create_mesh(MeshConfig())
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
    cfg = PredictConfig(pre_nms_topk=256, nms_impl="iterative",
                        score_thresh=1e-4)
    # beta pushes the new-class logits UP: on a prior-initialized model a
    # downward correction hides behind the per-anchor max over old classes
    bc = bic_correct_from_meta(
        {"bic": {"alphas": [1.0], "betas": [3.0]}}, [2, 2], 4)

    plain = make_predict_fn(model, cfg)(variables, images)
    ref = make_predict_fn(model, cfg, bic_correct=bc)(variables, images)
    out = make_sharded_predict_fn(model, cfg, mesh,
                                  bic_correct=bc)(variables, images)

    np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(out.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    assert not np.allclose(np.asarray(plain.scores), np.asarray(ref.scores))
    # the batch axis is actually sharded over 'data'
    assert "data" in str(out.scores.sharding.spec)


def _zero1_state_and_batch(every_iter=1):
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), C)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3)))
    tx = make_optimizer(ScheduleConfig(lr=1e-3, every_iter=every_iter),
                        variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    anchors = jnp.asarray(anchors_for_shape(H, W))
    rng = np.random.RandomState(3)
    images = rng.randn(8, H, W, 3).astype(np.float32) * 0.1
    boxes = np.full((8, 4, 4), -1, np.float32)
    labels = np.full((8, 4), -1, np.int32)
    boxes[:, 0] = [12, 12, 44, 44]
    labels[:, 0] = 2
    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C), StepStatics(every_iter=every_iter),
        donate=False,
    )
    return model, state, anchors, (images, boxes, labels), step


def test_zero1_moments_sharded_and_parity():
    """ZeRO-1: Adam moments shard over the data axis (1/8 memory per
    device), the updated params come back replicated (the step's
    param_constraint), and two optimizer steps match the fully-replicated
    run."""
    from cl_object_detection_tpu.parallel.mesh import (
        make_param_constraint,
        shard_train_state,
    )
    from cl_object_detection_tpu.train.step import make_train_step as mts

    mesh = create_mesh(MeshConfig())
    model, state, anchors, (images, boxes, labels), step_ref = (
        _zero1_state_and_batch())

    # reference: fully replicated, 2 steps
    s_ref = jax.device_put(state, replicate(mesh))
    batch = shard_batch(mesh, {"images": images, "boxes": boxes,
                               "labels": labels})
    s_ref, _ = step_ref(s_ref, batch["images"], batch["boxes"], batch["labels"])
    s_ref, _ = step_ref(s_ref, batch["images"], batch["boxes"], batch["labels"])

    # zero1: moments sharded, params constrained back to replicated
    s_z = shard_train_state(mesh, state, zero1=True)
    step_z = mts(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C), StepStatics(every_iter=1),
        donate=False,
        param_constraint=make_param_constraint(mesh),
    )
    s_z, m = step_z(s_z, batch["images"], batch["boxes"], batch["labels"])
    s_z, _ = step_z(s_z, batch["images"], batch["boxes"], batch["labels"])
    assert np.isfinite(float(m["total_loss"]))

    # moments actually sharded: some leaf carries 'data' in its spec and
    # holds only 1/8 of the elements per device
    sharded = [
        x for x in jax.tree.leaves(s_z.opt_state)
        if hasattr(x, "sharding") and x.ndim > 0
        and "data" in str(getattr(x.sharding, "spec", ""))
    ]
    assert sharded, "no ZeRO-1-sharded moment leaves found"
    big = max(sharded, key=lambda x: x.size)
    assert big.addressable_shards[0].data.size == big.size // 8

    # params replicated after the update
    k = s_z.params["classification_head"]["output"]["kernel"]
    assert k.sharding.is_fully_replicated

    # parity with the replicated run
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_zero1_composes_with_tp():
    """ZeRO-1 on a 4x2 (data x model) mesh: TP-sharded head moments gain
    the data axis on a FREE dim, and a step stays finite with params back
    on their TP sharding."""
    from cl_object_detection_tpu.parallel.mesh import (
        head_tp_spec,
        make_param_constraint,
        shard_train_state,
        zero1_extend_spec,
    )
    from cl_object_detection_tpu.train.step import make_train_step as mts
    from jax.sharding import PartitionSpec as P

    # spec math: a col-parallel head kernel (cout on 'model') gets 'data'
    # on cin; a leaf with no divisible free dim stays put
    spec = zero1_extend_spec(P(None, None, None, "model"), (3, 3, 256, 128),
                             ndata=4)
    assert spec == P(None, None, "data", "model")
    assert zero1_extend_spec(P(), (7,), ndata=4) == P()

    mesh = create_mesh(MeshConfig(num_model=2))
    model, state, anchors, (images, boxes, labels), _ = (
        _zero1_state_and_batch())
    s_z = shard_train_state(mesh, state, num_model=2, zero1=True)
    step = mts(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C), StepStatics(every_iter=1),
        donate=False,
        param_constraint=make_param_constraint(mesh, num_model=2),
    )
    batch = shard_batch(mesh, {"images": images, "boxes": boxes,
                               "labels": labels})
    s_z, m = step(s_z, batch["images"], batch["boxes"], batch["labels"])
    assert np.isfinite(float(m["total_loss"]))
    # a head-trunk moment leaf carries both axes
    specs = {
        str(getattr(x.sharding, "spec", ""))
        for x in jax.tree.leaves(s_z.opt_state)
        if hasattr(x, "sharding") and x.ndim == 4
    }
    assert any("data" in s and "model" in s for s in specs), specs
    # params keep their TP sharding after the constrained update
    k = s_z.params["classification_head"]["conv1"]["kernel"]
    assert "model" in str(k.sharding.spec)


def test_bic_vector_args_match_closure():
    """BiC as runtime (scale, offset) vectors == the baked-in closure —
    the one-compiled-program-for-all-epochs path of
    evaluator.predict_dataset_multi."""
    from cl_object_detection_tpu.config import ModelConfig, PredictConfig
    from cl_object_detection_tpu.eval.predictor import make_predict_fn
    from cl_object_detection_tpu.il.bic import bic_correct_from_meta

    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 4)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32))
    cfg = PredictConfig(pre_nms_topk=256, nms_impl="iterative",
                        score_thresh=1e-4)
    bc = bic_correct_from_meta(
        {"bic": {"alphas": [0.7], "betas": [2.5]}}, [2, 2], 4)
    assert bc.scale.shape == (4,) and bc.offset.shape == (4,)

    ref = make_predict_fn(model, cfg, bic_correct=bc)(variables, images)
    shared = make_predict_fn(model, cfg)
    out = shared(variables, images, jnp.asarray(bc.scale),
                 jnp.asarray(bc.offset))
    plain = shared(variables, images)

    np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(out.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    assert not np.allclose(np.asarray(plain.scores), np.asarray(out.scores))
