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
