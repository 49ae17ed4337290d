"""Unit tests for the CL method modules (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_object_detection_tpu.il.bic import class_state_index, make_bic_correct
from cl_object_detection_tpu.il.herding import foreground_ratio
from cl_object_detection_tpu.il.losses import (
    classifier_similarity_loss,
    mas_penalty,
)
from cl_object_detection_tpu.il.mas import importance_mask
from cl_object_detection_tpu.il.agem import bn_mask
from cl_object_detection_tpu.il.scail import ranked_mean, standardize_new_classifier


def test_bic_correction_slices():
    """State-0 classes pass through; state-k classes get alpha_k-1*x+beta."""
    counts = [3, 2, 1]  # scenario 3+2+1
    correct = make_bic_correct(counts, num_knowing=6)
    logits = jnp.ones((1, 4, 6))
    alphas = jnp.asarray([2.0, 3.0])
    betas = jnp.asarray([0.5, -1.0])
    out = np.asarray(correct(logits, alphas, betas))
    np.testing.assert_allclose(out[0, 0, :3], 1.0)            # state 0
    np.testing.assert_allclose(out[0, 0, 3:5], 2.0 * 1 + 0.5) # state 1
    np.testing.assert_allclose(out[0, 0, 5:], 3.0 * 1 - 1.0)  # state 2


def test_class_state_index():
    np.testing.assert_array_equal(class_state_index([2, 3]), [0, 0, 1, 1, 1])


def test_foreground_ratio_inclusion_exclusion():
    # two overlapping 10x10 boxes of the same class, 5px x-overlap
    boxes = np.array([[0, 0, 10, 10], [5, 0, 15, 10]], np.float32)
    labels = np.array([2, 2], np.int32)
    r = foreground_ratio(boxes, labels, img_area=1000.0)
    # union-ish = 100 + 100 - 50 = 150
    assert r[2] == pytest.approx(150 / 1000)


def test_mas_penalty_and_mask():
    params = {"backbone": {"w": jnp.ones((3,))},
              "bn1": {"bn": {"scale": jnp.ones((3,))}},
              "classification_head": {"output": {"kernel": jnp.ones((2,))}}}
    prev = jax.tree.map(lambda x: x * 0.0, params)
    mask = importance_mask(params)
    # bn and cls output excluded
    assert float(mask["bn1"]["bn"]["scale"].sum()) == 0
    assert float(mask["classification_head"]["output"]["kernel"].sum()) == 0
    assert float(mask["backbone"]["w"].sum()) == 3
    # downsample BN carries importance (the reference's name filter misses
    # `downsample.1` — mirrored faithfully)
    p2 = {"layer2_0": {"downsample_bn": {"bn": {"scale": jnp.ones(2)}}}}
    assert float(importance_mask(p2)["layer2_0"]["downsample_bn"]["bn"]
                 ["scale"].sum()) == 2

    imp = jax.tree.map(lambda m: m * 2.0, mask)
    # penalty = ratio * sum(2 * (1-0)^2) over backbone only = 0.5*2*3 = 3
    loss = mas_penalty(params, prev, imp, ratio=0.5)
    assert float(loss) == pytest.approx(3.0)


def test_mas_penalty_shape_mismatch_contributes_zero():
    params = {"out": {"kernel": jnp.ones((4,))}}
    prev = {"out": {"kernel": jnp.ones((2,))}}   # expanded classifier case
    imp = {"out": {"kernel": jnp.ones((4,))}}
    assert float(mas_penalty(params, prev, imp, 1.0)) == 0.0


def test_bn_mask():
    params = {"backbone": {"bn1": {"bn": {"scale": jnp.ones(2)}},
                           "conv1": {"kernel": jnp.ones(2)}}}
    m = bn_mask(params)
    assert float(m["backbone"]["bn1"]["bn"]["scale"].sum()) == 0
    assert float(m["backbone"]["conv1"]["kernel"].sum()) == 2
    # the reference's `"bn" not in name` filter misses the downsample BN
    # (torch `downsample.1`) — it stays IN the replay-grad vector
    p2 = {"layer2_0": {"downsample_bn": {"bn": {"scale": jnp.ones(2)}}}}
    assert float(bn_mask(p2)["layer2_0"]["downsample_bn"]["bn"]["scale"]
                 .sum()) == 2


def test_classifier_similarity_loss():
    past = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    # new vector parallel to past[0]: |cos|=1 -> loss = 1-delta per pair over delta
    new = jnp.asarray([[2.0, 0.0]])
    loss = classifier_similarity_loss(new, past, delta=0.5)
    assert float(loss) == pytest.approx(0.5)  # only the parallel pair clips
    # orthogonal-ish new vector under the margin -> 0
    new2 = jnp.asarray([[1.0, 1.0]])  # cos = 0.707 with each -> 0.207*2
    loss2 = classifier_similarity_loss(new2, past, delta=0.5)
    assert float(loss2) == pytest.approx(2 * (np.sqrt(0.5) - 0.5), abs=1e-6)


def test_scail_standardize():
    rng = np.random.RandomState(0)
    kh, kw, cin, A, C = 3, 3, 8, 9, 4
    kernel = rng.randn(kh, kw, cin, A * C).astype(np.float32)
    # make new classes (2,3) much larger
    k5 = kernel.reshape(kh, kw, cin, A, C)
    k5[..., 2:] *= 10
    params = {"classification_head": {"output": {
        "kernel": jnp.asarray(k5.reshape(kh, kw, cin, A * C)),
        "bias": jnp.zeros(A * C)}}}
    out = standardize_new_classifier(params, num_past_class=2, num_anchors=A)
    from cl_object_detection_tpu.models.expand import classifier_class_vectors

    v_before = classifier_class_vectors(params, A)
    v_after = classifier_class_vectors(out, A)
    # old classes untouched
    np.testing.assert_allclose(v_after[:2], v_before[:2], rtol=1e-6)
    # new class norms now match the old ranked-mean norm
    target = np.linalg.norm(ranked_mean(v_before[:2]))
    np.testing.assert_allclose(np.linalg.norm(v_after[2]), target, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(v_after[3]), target, rtol=1e-5)


def test_prototype_loss_margin():
    from cl_object_detection_tpu.il.prototype import prototype_loss_from_batch

    B, cells, D, A = 1, 4, 8, 9
    unfolded = jnp.ones((B, cells, D))
    pos = jnp.zeros((B, cells * A), bool).at[0, 0].set(True)
    labels = jnp.zeros((B, cells * A), jnp.int32) + 2  # new class (past=2)
    old_protos = jnp.zeros((2, D))  # distance = sqrt(8) ~ 2.83
    loss = prototype_loss_from_batch(
        unfolded, pos, labels, old_protos, num_past_class=2, num_new_class=1,
        margin=10.0, weight=1.0,
    )
    # cur prototype averages over 9 slots but only slot 0 has data ->
    # mean = ones/9... counts clamp handles empties; dist to zeros
    assert float(loss) > 0  # inside the margin -> positive
    loss_far = prototype_loss_from_batch(
        unfolded * 1000, pos, labels, old_protos, num_past_class=2,
        num_new_class=1, margin=10.0, weight=1.0,
    )
    assert float(loss_far) == 0.0  # far outside the margin


def test_sample_by_slot_scores_reference_semantics():
    """Hand-computed fixture of the reference pick distribution
    (train/il_trainer.py:197-223): budget split round-robin over slot
    RANKS (count-descending), each rank takes closest-first from its
    slot, skipping taken/excluded images globally."""
    from cl_object_detection_tpu.il.prototype import sample_by_slot_scores

    A = 3  # 3 anchor slots for a readable fixture
    # class 0: slot counts [5, 9, 1] -> rank order slots [1, 0, 2]
    counts = np.array([[5.0, 9.0, 1.0],
                       [2.0, 1.0, 3.0]])
    scores = {
        0: {0: {10: 0.3, 11: 0.1},          # slot 0 closest-first: 11, 10
            1: {12: 0.5, 13: 0.2, 10: 0.4},  # slot 1: 13, 10, 12
            2: {14: 0.9}},
        1: {0: {20: 0.1}, 1: {}, 2: {21: 0.2, 12: 0.1}},
    }
    # per_num=4 over 3 slots -> shares by rank [2, 1, 1]
    out = sample_by_slot_scores(scores, counts, per_num=4, classes=[0, 1],
                                num_anchors=A)
    # class 0: rank0=slot1 takes 13,10; rank1=slot0 takes 11 (10 taken);
    # rank2=slot2 takes 14
    assert out[0] == [13, 10, 11, 14]
    # class 1: rank order slots [2, 0, 1]; image 12 is still free (class
    # 0's slot-1 budget stopped at 13,10), so slot2 takes 12, 21;
    # rank1=slot0 takes 20; rank2=slot1 is empty
    assert out[1] == [12, 21, 20]

    # exclusion (future-class images) and already-taken are honored
    out2 = sample_by_slot_scores(scores, counts, per_num=4, classes=[0],
                                 already=[13], exclude={14}, num_anchors=A)
    # slot1 (rank0) takes 10, 12 (13 already taken); slot0 takes 11;
    # slot2's only image 14 is excluded -> short pick
    assert out2[0] == [10, 12, 11]


def test_slot_scores_match_classmean_reduction(rng=np.random.default_rng(0)):
    """The slot-ranking data and the classmean path must agree on WHICH
    images carry a class: an image appears in some slot of
    scores[cls] iff it has a positive of cls (counts row nonzero)."""
    from cl_object_detection_tpu.il.prototype import (
        sample_by_scores, sample_by_slot_scores)

    # degenerate single-slot case: slots mode must reduce to classmean
    # ordering (one slot holds all images -> closest-first per class)
    imgs = {100: 0.4, 101: 0.1, 102: 0.3}
    slot_scores = {0: {0: dict(imgs)}}
    counts = np.array([[3.0]])
    out_slots = sample_by_slot_scores(slot_scores, counts, per_num=2,
                                      classes=[0], num_anchors=1)
    out_mean = sample_by_scores({0: dict(imgs)}, per_num=2)
    assert out_slots[0] == out_mean[0] == [101, 102]


def test_anchor_provider_orientation_regression():
    """IL tool passes must hand portrait batches portrait-grid anchors.

    Regression: every dataset-pass helper (MAS, prototypes, similarity,
    BiC, A-GEM) used the landscape anchors for ALL batches — landscape
    and portrait frames have the SAME anchor count, so the mismatch was
    silent. A GT box in the bottom third of a portrait image is covered
    only by the portrait grid (the landscape grid spans the top 64 rows),
    so MAS importance must differ between a shape-aware provider and the
    constant-landscape array."""
    from types import SimpleNamespace

    from cl_object_detection_tpu.config import ModelConfig
    from cl_object_detection_tpu.il.mas import compute_importance
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import (
        anchors_for_shape,
        as_anchor_provider,
    )

    land = anchors_for_shape(64, 96)
    port = anchors_for_shape(96, 64)
    const = as_anchor_provider(land)
    a1 = const(np.zeros((1, 96, 64, 3)))
    a2 = const(np.zeros((1, 64, 96, 3)))
    assert a1 is a2                      # device transfer hoisted once
    np.testing.assert_array_equal(np.asarray(a1), land)
    fn = lambda images: land
    assert as_anchor_provider(fn) is fn

    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 5)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rng = np.random.RandomState(0)
    img = rng.rand(1, 96, 64, 3).astype(np.float32)
    # 32x32 box centered (28, 76): exact match of the level-3 anchor at
    # that center in the PORTRAIT grid; outside the landscape grid's rows
    boxes = np.asarray([[[12.0, 60.0, 44.0, 92.0]]], np.float32)
    labels = np.asarray([[2]], np.int32)
    batch = SimpleNamespace(images=img, boxes=boxes, labels=labels)

    def oriented(images):
        return port if images.shape[1] == 96 else land

    good = compute_importance(model, variables, oriented, [batch])
    bad = compute_importance(model, variables, land, [batch])
    diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(good), jax.tree.leaves(bad))
    )
    assert diff > 0.0, "orientation-aware anchors must change the result"
