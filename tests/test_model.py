"""Model shape/init contracts + classifier expansion surgery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_object_detection_tpu.config import ModelConfig
from cl_object_detection_tpu.models import create_retinanet, expand_classifier
from cl_object_detection_tpu.models.expand import classifier_class_vectors
from cl_object_detection_tpu.ops.anchors import num_anchors_for_shape

H, W, C = 64, 64, 5


@pytest.fixture(scope="module")
def model_and_params():
    cfg = ModelConfig(depth=18, compute_dtype="float32")
    model = create_retinanet(cfg, num_classes=C)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    return model, params


def test_forward_shapes(model_and_params):
    model, variables = model_and_params
    cls, reg = model.apply(variables, jnp.zeros((2, H, W, 3)))
    A = num_anchors_for_shape(H, W)
    assert cls.shape == (2, A, C)
    assert reg.shape == (2, A, 4)


def test_prior_init_probability(model_and_params):
    """Zero-weight output conv + prior bias => p ~= 0.01 everywhere."""
    model, variables = model_and_params
    cls, reg = model.apply(variables, jnp.zeros((1, H, W, 3)))
    np.testing.assert_allclose(np.asarray(cls), 0.01, atol=1e-3)
    np.testing.assert_allclose(np.asarray(reg), 0.0, atol=1e-6)


def test_logits_mode(model_and_params):
    model, variables = model_and_params
    cls, _ = model.apply(variables, jnp.zeros((1, H, W, 3)), enable_act=False)
    expected = -np.log((1 - 0.01) / 0.01)
    np.testing.assert_allclose(np.asarray(cls), expected, atol=1e-3)


def test_forward_all_features(model_and_params):
    model, variables = model_and_params
    cls, reg, feats = model.apply(
        variables, jnp.zeros((1, H, W, 3)), method="forward_all"
    )
    assert len(feats) == 5
    assert feats[0].shape == (1, H // 8, W // 8, 256)
    assert feats[4].shape == (1, -(-H // 128), -(-W // 128), 256)


def test_classification_features(model_and_params):
    model, variables = model_and_params
    cls, reg, feats, unfolded = model.apply(
        variables, jnp.zeros((1, H, W, 3)), method="classification_features"
    )
    cells = sum(f.shape[1] * f.shape[2] for f in feats)
    assert unfolded.shape == (1, cells, 256 * 9)


def test_expand_classifier(model_and_params):
    model, variables = model_and_params
    params = variables["params"]
    key = "classification_head"

    # make old weights distinguishable
    import copy
    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    kh, kw, cin, total = params[key]["output"]["kernel"].shape
    c_old = total // 9
    assert c_old == C
    params[key]["output"]["kernel"] = np.random.RandomState(0).randn(
        kh, kw, cin, total
    ).astype(np.float32)

    sim = np.array([[0.5, 0.5, 0, 0, 0]], np.float32)  # 1 new class
    new_params = expand_classifier(params, 1, similarity=sim, method="mean")
    k_new = new_params[key]["output"]["kernel"]
    assert k_new.shape == (kh, kw, cin, 9 * (C + 1))

    old = params[key]["output"]["kernel"].reshape(kh, kw, cin, 9, C)
    new = np.asarray(k_new).reshape(kh, kw, cin, 9, C + 1)
    # old classes preserved per anchor slot
    np.testing.assert_allclose(new[..., :C], old)
    # new class = 0.5*class0 + 0.5*class1
    np.testing.assert_allclose(
        new[..., C], 0.5 * old[..., 0] + 0.5 * old[..., 1], rtol=1e-5
    )
    # bias: old kept, new = prior + 0.5*b0 + 0.5*b1
    b_old = params[key]["output"]["bias"].reshape(9, C)
    b_new = np.asarray(new_params[key]["output"]["bias"]).reshape(9, C + 1)
    np.testing.assert_allclose(b_new[:, :C], b_old)
    prior = -np.log(0.99 / 0.01)
    np.testing.assert_allclose(
        b_new[:, C], prior + 0.5 * b_old[:, 0] + 0.5 * b_old[:, 1], rtol=1e-5
    )


def test_expanded_model_runs(model_and_params):
    model, variables = model_and_params
    cfg = ModelConfig(depth=18, compute_dtype="float32")
    from cl_object_detection_tpu.models import create_retinanet as mk

    new_params = expand_classifier(variables["params"], 2, method="none")
    bigger = mk(cfg, num_classes=C + 2)
    out_cls, _ = bigger.apply(
        {"params": new_params, "batch_stats": variables["batch_stats"]},
        jnp.zeros((1, H, W, 3)),
    )
    A = num_anchors_for_shape(H, W)
    assert out_cls.shape == (1, A, C + 2)
    # new classes at prior probability
    np.testing.assert_allclose(np.asarray(out_cls[..., C:]), 0.01, atol=1e-3)


def test_class_vectors_deinterleave(model_and_params):
    model, variables = model_and_params
    vecs = classifier_class_vectors(variables["params"])
    kh, kw, cin, total = variables["params"]["classification_head"]["output"]["kernel"].shape
    assert vecs.shape == (C, 9 * kh * kw * cin)


def test_remat_same_tree_and_output():
    cfg = ModelConfig(depth=18, compute_dtype="float32")
    cfg_r = ModelConfig(depth=18, compute_dtype="float32", remat=True)
    m = create_retinanet(cfg, num_classes=3)
    mr = create_retinanet(cfg_r, num_classes=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # identical param structure -> checkpoints are interchangeable
    vr = mr.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vr)
    a, _ = m.apply(v, jnp.ones((1, 64, 64, 3)))
    b, _ = mr.apply(v, jnp.ones((1, 64, 64, 3)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # gradients flow through the remat path
    g = jax.grad(lambda p: mr.apply({"params": p, "batch_stats": v["batch_stats"]},
                                    jnp.ones((1, 64, 64, 3)))[0].sum())(v["params"])
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_s2d_stem_matches_direct():
    """Space-to-depth phase-packed stem (StemConv 12-channel path +
    phase_pool) equals the direct 7x7/2 conv + 3x3/2 pool through the
    whole backbone (same params, both input forms)."""
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.data.transforms import space_to_depth
    from cl_object_detection_tpu.models.resnet import ResNetBackbone

    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 96, 3).astype(np.float32)
    bb = ResNetBackbone(depth=50, dtype=jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = bb.apply(v, jnp.asarray(x))
    got = bb.apply(v, jnp.asarray(space_to_depth(x)))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   atol=2e-4, rtol=1e-4)


def test_s2d_full_model_detections_match():
    """Full RetinaNet forward agrees between RGB and s2d inputs."""
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import ModelConfig
    from cl_object_detection_tpu.data.transforms import space_to_depth
    from cl_object_detection_tpu.models import create_retinanet

    rng = np.random.RandomState(1)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 4)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cls_a, reg_a = model.apply(v, jnp.asarray(x), enable_act=False)
    cls_b, reg_b = model.apply(v, jnp.asarray(space_to_depth(x)),
                               enable_act=False)
    np.testing.assert_allclose(np.asarray(cls_a), np.asarray(cls_b),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_a), np.asarray(reg_b),
                               atol=1e-4, rtol=1e-4)


def test_uint8_transfer_on_device_normalize():
    """DataConfig.transfer_dtype="uint8": the backbone normalizes raw
    8-bit pixels on device; outputs match the host-normalized float path
    exactly (same math, same order), for both RGB and s2d layouts."""
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import ModelConfig
    from cl_object_detection_tpu.data.transforms import (
        normalize_image,
        space_to_depth,
    )
    from cl_object_detection_tpu.models import create_retinanet

    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (1, 64, 96, 3)).astype(np.uint8)
    f32 = normalize_image(raw.astype(np.float32)[0] / 255.0)[None]

    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    a = model.apply(v, jnp.asarray(f32), enable_act=False)
    b = model.apply(v, jnp.asarray(raw), enable_act=False)
    c = model.apply(v, jnp.asarray(space_to_depth(raw)), enable_act=False)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(c[0]), atol=1e-4)


def test_uint8_loader_batches(tmp_path):
    import os

    from cl_object_detection_tpu.config import DataConfig
    from cl_object_detection_tpu.data.coco import CocoJson
    from cl_object_detection_tpu.data.dataset import ILDataset
    from cl_object_detection_tpu.data.loader import BatchLoader
    from cl_object_detection_tpu.states import ILStates
    from cl_object_detection_tpu.utils.toydata import make_toy_dataset

    root = str(tmp_path)
    j = make_toy_dataset(root, num_images=4)
    coco = CocoJson(j)
    states = ILStates(list(coco.classes.values()), coco.classes_inverse, [5])
    ds = ILDataset(coco, states, os.path.join(root, "images"), split="train",
                   start_state=0)
    cfg = DataConfig(batch_size=2, min_side=56, max_side=96, height=64,
                     width=96, max_boxes=8, transfer_dtype="uint8")
    b = next(iter(BatchLoader(ds, cfg, shuffle=False, augment=False)))
    assert b.images.dtype == np.uint8
    assert b.images.max() > 1  # raw pixel range, not normalized
