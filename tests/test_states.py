"""IL scenario expansion vs the reference semantics (params.py:31-103)."""
import pytest

from cl_object_detection_tpu.states import ILStates

VOC = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]
NAME_TO_ID = {n: i + 1 for i, n in enumerate(sorted(VOC))}


def make(scenario, **kw):
    return ILStates(VOC, NAME_TO_ID, scenario, **kw)


def test_joint_20():
    st = make([20])
    assert len(st) == 1
    assert st[0].num_new_class == 20
    assert st[0].num_knowing_class == 20
    assert st[0].num_past_class == 0
    assert st[0].knowing_names == sorted(VOC)


def test_10_10():
    st = make([10, 10])
    assert st[0].new_names == sorted(VOC)[:10]
    assert st[1].new_names == sorted(VOC)[10:]
    assert st[1].num_past_class == 10
    assert st[1].num_knowing_class == 20
    assert st[1].knowing_names[:10] == st[0].knowing_names


def test_15_1_special_case():
    """['15','1'] forces state 1's new class to 'train' (params.py:53-55)."""
    st = make(["15", "1"])
    assert len(st) == 2
    assert st[1].new_names == ["train"]
    assert st[0].num_new_class == 15
    assert "train" not in st[0].new_names
    # no duplicate classes anywhere
    assert len(set(st[1].knowing_names)) == 16


def test_named_class_scenario():
    st = make([19, "tvmonitor"])
    assert st[1].new_names == ["tvmonitor"]
    assert st[0].num_new_class == 19
    assert "tvmonitor" not in st[0].new_names


def test_new_ids_sorted_within_block():
    st = make([10, 10])
    assert st[1].new_ids == sorted(st[1].new_ids)


def test_label_map_stable_across_states():
    st = make([15, 1, 1, 1, 1, 1])
    lm = st.label_map()
    assert len(lm) == 20
    # final knowing order defines labels; state-0 classes occupy 0..14
    for i, cid in enumerate(st[0].knowing_ids):
        assert lm[cid] == i


def test_shuffle_reproducible():
    a = make([10, 10], shuffle_class=True, shuffle_seed=7)
    b = make([10, 10], shuffle_class=True, shuffle_seed=7)
    c = make([10, 10], shuffle_class=True, shuffle_seed=8)
    assert a.class_order == b.class_order
    assert a.class_order != c.class_order


def test_scenario_too_long_raises():
    with pytest.raises(ValueError):
        make([15, 10])


def test_print_il_info_smoke(capsys):
    # main.py:223-225 / params.py:404-411 parity surface
    from cl_object_detection_tpu.cli.common import print_il_info
    from cl_object_detection_tpu.config import TrainConfig

    st = make([15, 5])
    print_il_info(TrainConfig(), st)
    out = capsys.readouterr().out
    assert "Total State number = 2" in out
    assert "Total Class number = 20" in out
    assert "scenario" in out
