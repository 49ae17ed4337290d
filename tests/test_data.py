"""Dataset family + static-shape batch loader on the synthetic toy dataset."""
import numpy as np
import pytest

from cl_object_detection_tpu.config import DataConfig
from cl_object_detection_tpu.data import BatchLoader, CocoJson, ILDataset, ReplayDataset
from cl_object_detection_tpu.states import ILStates
from cl_object_detection_tpu.utils.toydata import DEFAULT_CLASSES, make_toy_dataset


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toy"))
    json_path = make_toy_dataset(root, num_images=12, seed=3)
    coco = CocoJson(json_path)
    states = ILStates(
        list(DEFAULT_CLASSES), coco.classes_inverse, [3, 2], shuffle_class=False
    )
    return root, coco, states


def test_train_split_sees_only_new_classes(toy):
    root, coco, states = toy
    ds = ILDataset(coco, states, root + "/images", split="train", start_state=0)
    assert set(ds.seen_class_ids) == set(states[0].new_ids)
    for i in range(len(ds)):
        _, labels, _ = ds.load_annotations(i)
        assert all(l < 3 for l in labels)  # first 3 classes only


def test_test_split_sees_knowing_classes(toy):
    root, coco, states = toy
    ds = ILDataset(coco, states, root + "/images", split="test", start_state=1)
    assert set(ds.seen_class_ids) == set(states[1].knowing_ids)


def test_next_state_switches_class_subset(toy):
    root, coco, states = toy
    ds = ILDataset(coco, states, root + "/images", split="train", start_state=0)
    ids0 = list(ds.image_ids)
    ds.next_state()
    assert set(ds.seen_class_ids) == set(states[1].new_ids)
    assert ds.image_ids  # state-1 images exist in the toy set


def test_pseudo_labels_appended(toy):
    root, coco, states = toy
    ds0 = ILDataset(coco, states, root + "/images", split="train")
    img_id = ds0.image_ids[0]
    pseudo = {img_id: [{"bbox": [1.0, 2.0, 10.0, 12.0], "category_id": states[0].new_ids[0]}]}
    ds = ILDataset(coco, states, root + "/images", split="train", pseudo_labels=pseudo)
    boxes, labels, n_pseudo = ds.load_annotations(0)
    assert n_pseudo == 1
    np.testing.assert_allclose(boxes[-1], [1, 2, 11, 14])  # xywh -> xyxy


def test_loader_static_shapes(toy):
    root, coco, states = toy
    cfg = DataConfig(batch_size=3, height=256, width=384, max_boxes=10,
                     min_side=200, max_side=384)
    ds = ILDataset(coco, states, root + "/images", split="test", start_state=1)
    loader = BatchLoader(ds, cfg, shuffle=True, augment=True, prefetch=0)
    shapes = set()
    for batch in loader:
        assert batch.images.shape[0] == 3
        assert batch.images.shape[3] == 3
        shapes.add(batch.images.shape[1:3])
        assert batch.boxes.shape == (3, 10, 4)
        assert batch.labels.shape == (3, 10)
        # valid boxes lie inside the canonical frame
        h, w = batch.images.shape[1:3]
        for b in range(3):
            n = batch.num_boxes[b]
            assert (batch.labels[b, :n] >= 0).all()
            assert (batch.labels[b, n:] == -1).all()
            if n:
                assert batch.boxes[b, :n, 2].max() <= w + 1e-3
                assert batch.boxes[b, :n, 3].max() <= h + 1e-3
    # only the two orientation buckets ever appear
    assert shapes <= {(256, 384), (384, 256)}


def test_replay_dataset_sampling(toy):
    root, coco, states = toy
    rd = ReplayDataset(coco, states, root + "/images", per_num=1, seed=0)
    rd.reset_by_state(1)
    assert rd.cur_state == 1
    assert len(rd.image_ids) == len(set(rd.image_ids))
    assert len(rd.image_ids) <= 3  # one per state-0 class, some may be scarce
    # reset_by_img_ids infers state from count
    rd2 = ReplayDataset(coco, states, root + "/images", per_num=1, seed=0)
    rd2.reset_by_img_ids(1, rd.image_ids[:3])
    assert rd2.cur_state == 1


def test_loader_deterministic_per_epoch(toy):
    root, coco, states = toy
    cfg = DataConfig(batch_size=2, height=256, width=384, max_boxes=10,
                     min_side=200, max_side=384)
    ds = ILDataset(coco, states, root + "/images", split="test", start_state=1)

    def order(epoch):
        loader = BatchLoader(ds, cfg, shuffle=True, augment=False, prefetch=0, seed=3)
        loader.set_epoch(epoch)
        return [tuple(b.image_ids.tolist()) for b in loader]

    assert order(4) == order(4)          # same (seed, epoch) -> same order
    assert order(4) != order(5)          # different epoch -> reshuffled


def test_loader_worker_count_invariance(toy):
    """Augmented batches are identical for 0, 1 and 4 decode workers —
    per-example RNG is a pure hash, not a shared sequential stream."""
    root, coco, states = toy
    cfg = DataConfig(batch_size=2, height=256, width=384, max_boxes=10,
                     min_side=200, max_side=384)
    ds = ILDataset(coco, states, root + "/images", split="test", start_state=1)

    def epoch_batches(workers):
        loader = BatchLoader(ds, cfg, shuffle=True, augment=True,
                             prefetch=0, seed=11, num_workers=workers)
        loader.set_epoch(2)
        return list(loader)

    a, b, c = epoch_batches(0), epoch_batches(1), epoch_batches(4)
    assert len(a) == len(b) == len(c) > 0
    for x, y in ((a, b), (a, c)):
        for bx, by in zip(x, y):
            np.testing.assert_array_equal(bx.image_ids, by.image_ids)
            np.testing.assert_allclose(bx.images, by.images)
            np.testing.assert_allclose(bx.boxes, by.boxes)


def test_loader_process_sharding_topology_independent(toy):
    """Multi-host loading: each process decodes only its contiguous slice
    of every global batch, and the concatenation of the per-process slices
    reproduces the single-process global batch bit-for-bit (augmentation
    RNG is keyed by GLOBAL slot, so the global batch does not depend on
    the process topology)."""
    root, coco, states = toy
    cfg = DataConfig(batch_size=4, height=256, width=384, max_boxes=10,
                     min_side=200, max_side=384)
    ds = ILDataset(coco, states, root + "/images", split="test", start_state=1)

    def batches(pi, pc):
        loader = BatchLoader(ds, cfg, shuffle=True, augment=True,
                             prefetch=0, seed=7,
                             process_index=pi, process_count=pc)
        loader.set_epoch(3)
        return list(loader)

    full = batches(0, 1)
    p0, p1 = batches(0, 2), batches(1, 2)
    assert len(full) == len(p0) == len(p1) > 0
    for f, a, b in zip(full, p0, p1):
        assert a.size == b.size == f.size // 2
        np.testing.assert_array_equal(
            np.concatenate([a.image_ids, b.image_ids]), f.image_ids)
        np.testing.assert_allclose(
            np.concatenate([a.images, b.images]), f.images)
        np.testing.assert_allclose(
            np.concatenate([a.boxes, b.boxes]), f.boxes)
        np.testing.assert_array_equal(
            np.concatenate([a.labels, b.labels]), f.labels)

    with pytest.raises(ValueError, match="not divisible"):
        BatchLoader(ds, cfg, batch_size=3, process_index=0, process_count=2)


def test_shape_buckets(tmp_path):
    """shape_buckets: each image pads into the smallest fitting frame
    (transposed for portrait); batches stay frame-homogeneous; the
    fallback frame still catches what no bucket fits."""
    import os

    from cl_object_detection_tpu.config import DataConfig
    from cl_object_detection_tpu.data.coco import CocoJson
    from cl_object_detection_tpu.data.dataset import ILDataset
    from cl_object_detection_tpu.data.loader import BatchLoader
    from cl_object_detection_tpu.data.transforms import pick_canonical
    from cl_object_detection_tpu.states import ILStates
    from cl_object_detection_tpu.utils.toydata import make_toy_dataset

    # unit: bucket choice
    assert pick_canonical(60, 90, 64, 128, ((64, 96),)) == (64, 96)
    assert pick_canonical(90, 60, 64, 128, ((64, 96),)) == (96, 64)   # portrait
    assert pick_canonical(64, 120, 64, 128, ((64, 96),)) == (64, 128) # no fit
    assert pick_canonical(60, 90, 64, 128, ()) == (64, 128)           # no buckets

    root = str(tmp_path)
    j = make_toy_dataset(root, num_images=10)
    coco = CocoJson(j)
    states = ILStates(list(coco.classes.values()), coco.classes_inverse, [5])
    ds = ILDataset(coco, states, os.path.join(root, "images"), split="train",
                   start_state=0)
    # toy 3:4 images resize to 56x75 at min_side=56: the (64, 80) bucket
    # FITS (75 <= 80) so the loader must route there, not the fallback
    cfg = DataConfig(batch_size=2, min_side=56, max_side=96, height=64,
                     width=96, max_boxes=8, shape_buckets=((64, 80),))
    loader = BatchLoader(ds, cfg, shuffle=False, augment=False)
    seen = set()
    nb = 0
    for b in loader:
        assert b.images.shape[0] == 2
        seen.add(b.images.shape[1:3])
        nb += 1
    assert (64, 80) in seen or (80, 64) in seen, f"bucket never hit: {seen}"
    assert seen <= {(64, 80), (80, 64), (64, 96), (96, 64)}, seen
    # __len__ must agree with the frame-grouped batching it iterates
    assert len(loader) == nb, (len(loader), nb)
