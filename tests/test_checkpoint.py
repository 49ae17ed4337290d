"""Orbax checkpoint manager: save/restore roundtrip, retention, sidecars."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cl_object_detection_tpu.config import ModelConfig, ScheduleConfig
from cl_object_detection_tpu.models import create_retinanet
from cl_object_detection_tpu.train.optim import make_optimizer
from cl_object_detection_tpu.train.state import TrainState
from cl_object_detection_tpu.utils.checkpoint import CheckpointManager


@pytest.fixture()
def state():
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 3)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    tx = make_optimizer(ScheduleConfig(every_iter=1), v["params"])
    return TrainState.create(params=v["params"], batch_stats=v["batch_stats"], tx=tx)


def test_roundtrip(tmp_path, state):
    mgr = CheckpointManager(str(tmp_path), ("10", "10"))
    mgr.save(0, 3, state, il_meta={"state": 0, "epoch": 3, "num_classes": 3})
    tree, meta = mgr.restore(0, 3)
    assert meta["epoch"] == 3
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(tree["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_latest_and_retention(tmp_path, state):
    mgr = CheckpointManager(str(tmp_path), ("20",), keep_every=5)
    for e in (1, 2, 3, 4, 5, 6, 7):
        mgr.save(0, e, state)
    assert mgr.latest_epoch(0) == 7
    mgr.auto_delete(0, 7)
    # keeps multiples of 5 and the current epoch
    assert mgr.epochs(0) == [5, 7]
    tree, _ = mgr.restore(0, -1)   # -1 -> newest (params.py:245-248)
    assert tree is not None


def test_async_roundtrip(tmp_path, state):
    """async_save: background write + atomic rename; readers wait()."""
    mgr = CheckpointManager(str(tmp_path), ("10", "10"))
    mgr.save(0, 1, state, il_meta={"epoch": 1}, async_save=True)
    mgr.save(0, 2, state, il_meta={"epoch": 2}, async_save=True)  # joins #1
    assert mgr.epochs(0) == [1, 2]          # epochs() drains the writer
    tree, meta = mgr.restore(0, -1)
    assert meta["epoch"] == 2
    for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(tree["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # no temp dirs left behind
    import os
    leftovers = [n for n in os.listdir(mgr.state_dir(0)) if n.startswith(".tmp")]
    assert leftovers == []


def test_sidecars(tmp_path, state):
    mgr = CheckpointManager(str(tmp_path), ("15", "1"))
    mgr.save_sidecar(1, "examplar", [3, 1, 4, 1, 5])
    assert mgr.load_sidecar(1, "examplar") == [3, 1, 4, 1, 5]
    assert mgr.load_sidecar(1, "nothing") is None

    tree = {"a": np.arange(6).reshape(2, 3), "b": {"c": np.ones(4)}}
    mgr.save_array_sidecar(0, "mas_importance", tree)
    back = mgr.load_array_sidecar(0, "mas_importance", like=tree)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"]["c"], tree["b"]["c"])


def test_opt_state_resume_with_target(tmp_path, state):
    """Restoring into the live structure preserves optax NamedTuple types
    and Adam moments/counters."""
    import jax.numpy as jnp

    # take a fake step so the opt state is nontrivial
    g = jax.tree.map(jnp.ones_like, state.params)
    updates, new_opt = state.tx.update(g, state.opt_state, state.params)
    state = state.replace(opt_state=new_opt, step=jnp.asarray(5, jnp.int32))

    mgr = CheckpointManager(str(tmp_path), ("20",))
    mgr.save(0, 1, state)

    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": jax.tree.map(jnp.zeros_like, state.opt_state),
        "step": jnp.zeros((), jnp.int32),
    }
    tree, _ = mgr.restore(0, 1, target=target)
    assert int(tree["step"]) == 5
    restored_leaves = jax.tree.leaves(tree["opt_state"])
    orig_leaves = jax.tree.leaves(state.opt_state)
    assert len(restored_leaves) == len(orig_leaves)
    for a, b in zip(orig_leaves, restored_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_nearest_epoch(tmp_path):
    from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path), ["5"], keep_every=5)
    for e in (2, 5, 9):
        import os
        os.makedirs(ckpt.epoch_dir(0, e), exist_ok=True)
    assert ckpt.nearest_epoch(0, 9) == 9
    assert ckpt.nearest_epoch(0, 8) == 5
    assert ckpt.nearest_epoch(0, 4) == 2
    assert ckpt.nearest_epoch(0, 1) is None
