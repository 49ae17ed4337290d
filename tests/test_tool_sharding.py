"""IL tool passes (MAS / similarity / prototypes / herding) over the mesh.

VERDICT r1 follow-up: the full-dataset sidecar passes ran single-device
even under --mesh. Each pass now accepts ``mesh=`` and shards its batches
over the ``data`` axis (single-process; parallel/mesh.tool_placers) —
these tests pin sharded == unsharded on the 8-virtual-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cl_object_detection_tpu.config import MeshConfig, ModelConfig
from cl_object_detection_tpu.data.loader import Batch
from cl_object_detection_tpu.il.herding import make_feature_fn
from cl_object_detection_tpu.il.mas import compute_importance
from cl_object_detection_tpu.il.prototype import (
    compute_prototype_features,
    make_batch_prototype_fn,
    make_image_feature_fn,
)
from cl_object_detection_tpu.il.weight_init import compute_similarity
from cl_object_detection_tpu.models import create_retinanet
from cl_object_detection_tpu.ops.anchors import anchors_for_shape
from cl_object_detection_tpu.parallel import create_mesh
from cl_object_detection_tpu.parallel.mesh import tool_placers

H, W, C = 64, 64, 4


def _model_and_vars(num_classes=C, seed=0):
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"),
                             num_classes)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, H, W, 3)))
    return model, variables


def _batches(n=2, b=8, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for k in range(n):
        images = rng.randn(b, H, W, 3).astype(np.float32) * 0.1
        boxes = np.full((b, 4, 4), -1, np.float32)
        labels = np.full((b, 4), -1, np.int32)
        nb = np.zeros((b,), np.int32)
        for i in range(b):
            boxes[i, 0] = [8 + i, 8, 40 + i, 40]
            labels[i, 0] = (i + k) % C
            nb[i] = 1
        out.append(Batch(
            images=images, boxes=boxes, labels=labels, num_boxes=nb,
            num_pseudo=np.zeros((b,), np.int32),
            scales=np.ones((b,), np.float32),
            image_ids=np.arange(b, dtype=np.int64) + k * b,
        ))
    return out


def test_mas_importance_sharded_matches():
    model, variables = _model_and_vars()
    anchors = jnp.asarray(anchors_for_shape(H, W))
    batches = _batches()
    plain = compute_importance(model, variables, anchors, batches)
    mesh = create_mesh(MeshConfig())
    shard = compute_importance(model, variables, anchors, batches, mesh=mesh)
    flat_p = jax.tree_util.tree_leaves(plain)
    flat_s = jax.tree_util.tree_leaves(shard)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-7)


def test_similarity_sharded_matches():
    model, variables = _model_and_vars(num_classes=2)
    anchors = jnp.asarray(anchors_for_shape(H, W))
    # labels in [2, 4): the NEW classes of a 2+2 scenario
    batches = _batches()
    for b in batches:
        b.labels[b.labels >= 0] = b.labels[b.labels >= 0] % 2 + 2
    plain = compute_similarity(model, variables, anchors, batches,
                               num_new=2, num_old=2)
    mesh = create_mesh(MeshConfig())
    shard = compute_similarity(model, variables, anchors, batches,
                               num_new=2, num_old=2, mesh=mesh)
    np.testing.assert_allclose(plain, shard, rtol=1e-4, atol=1e-6)


def test_prototype_features_sharded_matches():
    model, variables = _model_and_vars()
    anchors = jnp.asarray(anchors_for_shape(H, W))
    batches = _batches()
    plain = compute_prototype_features(model, variables, anchors, batches, C)
    mesh = create_mesh(MeshConfig())
    shard = compute_prototype_features(model, variables, anchors, batches, C,
                                       mesh=mesh)
    np.testing.assert_allclose(plain, shard, rtol=2e-4, atol=1e-5)


def test_image_feature_fn_matches_per_image_reference():
    """The batched per-image feature fn == the old one-image-at-a-time
    computation through make_batch_prototype_fn (prototype-herd scores)."""
    model, variables = _model_and_vars()
    anchors = jnp.asarray(anchors_for_shape(H, W))
    (batch,) = _batches(n=1)
    step_img = make_image_feature_fn(model, C)
    feat, cnt = step_img(variables, anchors, jnp.asarray(batch.images),
                         jnp.asarray(batch.boxes), jnp.asarray(batch.labels))
    feat, cnt = np.asarray(feat), np.asarray(cnt)

    step_old = make_batch_prototype_fn(model, C)
    for b in range(batch.images.shape[0]):
        s, c = step_old(variables, anchors,
                        jnp.asarray(batch.images[b:b + 1]),
                        jnp.asarray(batch.boxes[b:b + 1]),
                        jnp.asarray(batch.labels[b:b + 1]))
        s, c = np.asarray(s), np.asarray(c)
        ref_feat = s.sum(axis=1) / np.clip(c.sum(axis=1)[:, None], 1, None)
        np.testing.assert_allclose(feat[b], ref_feat, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(cnt[b], c.sum(axis=1), rtol=1e-6)


def test_herding_features_sharded_matches():
    model, variables = _model_and_vars()
    (batch,) = _batches(n=1)
    fn = make_feature_fn(model)
    plain = np.asarray(fn(variables, jnp.asarray(batch.images)))
    mesh = create_mesh(MeshConfig())
    put, rep = tool_placers(mesh)
    shard = np.asarray(fn(rep(variables), put(batch.images)))
    np.testing.assert_allclose(plain, shard, rtol=2e-4, atol=1e-5)
