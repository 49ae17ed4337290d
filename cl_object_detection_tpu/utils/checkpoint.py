"""Orbax checkpointing with the reference's retention + resume semantics.

Replaces torch.save dicts (/root/reference/preprocessing/params.py:236-322):
  * tree saved per (state, epoch):
      {params, batch_stats, opt_state-by-tree, il_meta}
  * layout: <ckpt_dir>/<scenario>/state<k>/epoch<e>/ (Orbax dirs instead of
    ``<dataset>_checkpoint_<e>.pt`` files);
  * ``latest_epoch`` finds the newest epoch (the reference's epoch=-1
    auto-locate, params.py:245-248);
  * ``auto_delete`` keeps epoch%keep_every==0 plus the latest
    (params.py:211-222);
  * IL side-metadata (exemplar ids, class lists, state index) rides along
    as a JSON-able dict instead of loose pickles.
"""
from __future__ import annotations

import json
import os
import re
import shutil
import threading
from typing import Any, Dict, List, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None


def scenario_tag(scenario) -> str:
    return "_".join(str(s) for s in scenario)


def _is_primary() -> bool:
    """Multi-host: only process 0 writes checkpoints/sidecars. Replicated
    trees are locally addressable on every host, so a single writer loses
    nothing; unguarded, N hosts would race rmtree/rename on a shared
    experiment dir (and duplicate the ~0.5 GB device->host pull)."""
    return jax.process_index() == 0


class CheckpointManager:
    def __init__(self, root: str, scenario, keep_every: int = 5):
        self.root = os.path.abspath(root)
        self.scenario_dir = os.path.join(self.root, scenario_tag(scenario))
        self.keep_every = keep_every
        self._pending: Optional[threading.Thread] = None
        self._pending_error: Optional[BaseException] = None
        self._barrier_seq = 0
        os.makedirs(self.scenario_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def state_dir(self, state: int) -> str:
        d = os.path.join(self.scenario_dir, f"state{state}")
        os.makedirs(d, exist_ok=True)
        return d

    def epoch_dir(self, state: int, epoch: int) -> str:
        return os.path.join(self.state_dir(state), f"epoch{epoch}")

    def epochs(self, state: int) -> List[int]:
        self.wait()
        d = self.state_dir(state)
        out = []
        for name in os.listdir(d):
            m = re.fullmatch(r"epoch(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_epoch(self, state: int) -> Optional[int]:
        eps = self.epochs(state)
        return eps[-1] if eps else None

    def nearest_epoch(self, state: int, upto: int) -> Optional[int]:
        """Newest saved epoch <= ``upto`` — resume fallback when the exact
        checkpoint was skipped by ``save_every`` or pruned by retention."""
        eps = [e for e in self.epochs(state) if e <= upto]
        return eps[-1] if eps else None

    # ------------------------------------------------------------------
    def _barrier(self, tag: str) -> None:
        """Cross-host sync around primary-only writes: every host calls
        save()/wait() at the same program points, so a barrier here keeps
        non-primary readers (teacher restore, sidecar loads) from racing
        process 0's in-flight write on a shared filesystem."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(
                f"ckpt_{tag}_{self._barrier_seq}")
            self._barrier_seq += 1

    def wait(self) -> None:
        """Block until any in-flight async save has finished (and re-raise
        its error, if it failed). Multi-host: also a cross-process barrier
        — every host calls wait() at the same program points (epochs/
        restore/save all route through it), so after it returns process
        0's async write is visible to every reader."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        self._barrier("wait")
        if self._pending_error is not None:
            err, self._pending_error = self._pending_error, None
            raise err

    def save(
        self,
        state: int,
        epoch: int,
        train_state,
        il_meta: Optional[Dict[str, Any]] = None,
        async_save: bool = False,
    ) -> str:
        """Persist one (state, epoch) checkpoint.

        ``async_save``: device->host of the full tree costs ~60 s through
        the remote-PJRT tunnel and would stall the train loop. Instead:
        snapshot on-device (cheap HBM copy — safe even though the train
        step donates its input state), then pull + write in a background
        thread into a hidden temp dir that is atomically renamed on
        completion, so readers (epochs/restore/auto_delete, which all
        ``wait()`` first) never see a partial checkpoint. At most one
        save is in flight; a second save joins the first.
        """
        self.wait()
        path = self.epoch_dir(state, epoch)
        if jax.process_count() > 1:
            # orbax's save synchronizes ALL processes internally
            # (sync_global_devices('Checkpointer:save_start') — a
            # primary-only call deadlocks the slice, found by
            # tests/test_multihost.py's real two-process run), and that
            # barrier cannot fire from a background thread while other
            # hosts run ahead — multi-host saves degrade to synchronous.
            async_save = False
        tree = {
            "params": train_state.params,
            "batch_stats": train_state.batch_stats,
            "opt_state": train_state.opt_state,
            "step": train_state.step,
        }
        if not async_save:
            stage = path + ".tmp_sync"
            if _is_primary() and os.path.exists(stage):
                shutil.rmtree(stage)
            if _is_primary() or jax.process_count() > 1:
                # every process participates (orbax coordinates the
                # write internally: process 0 writes, the rest sync);
                # only process 0 below mutates the visible directory
                ocp.PyTreeCheckpointer().save(
                    stage, jax.tree.map(np.asarray, tree))
            if _is_primary():
                if il_meta is not None:
                    with open(os.path.join(stage, "il_meta.json"), "w") as f:
                        json.dump(il_meta, f, indent=2, default=_jsonable)
                if os.path.exists(path):
                    shutil.rmtree(path)
                os.rename(stage, path)
            self._barrier("ckpt_save")
            return path

        import jax.numpy as jnp

        snap = jax.tree.map(
            lambda x: jnp.array(x) if isinstance(x, jax.Array) else x, tree
        )
        tmp = os.path.join(self.state_dir(state), f".tmp_epoch{epoch}")

        def work():
            try:
                if os.path.exists(tmp):
                    shutil.rmtree(tmp)
                ocp.PyTreeCheckpointer().save(tmp, jax.tree.map(np.asarray, snap))
                if il_meta is not None:
                    with open(os.path.join(tmp, "il_meta.json"), "w") as f:
                        json.dump(il_meta, f, indent=2, default=_jsonable)
                # delete the existing epoch only once the replacement is
                # complete — a crash during the ~60s write must not lose
                # BOTH copies
                if os.path.exists(path):
                    shutil.rmtree(path)
                os.rename(tmp, path)
            except BaseException as e:  # surfaced by the next wait()
                self._pending_error = e
                shutil.rmtree(tmp, ignore_errors=True)

        self._pending = threading.Thread(target=work, daemon=True)
        self._pending.start()
        return path

    def restore(self, state: int, epoch: int = -1, target=None):
        """epoch=-1 locates the newest (reference params.py:245-248).
        Returns (tree, il_meta)."""
        self.wait()
        if epoch == -1:
            epoch = self.latest_epoch(state)
            if epoch is None:
                raise FileNotFoundError(f"no checkpoints for state {state}")
        path = self.epoch_dir(state, epoch)
        ckptr = ocp.PyTreeCheckpointer()
        if target is not None:
            tree = ckptr.restore(path, item=target)
        else:
            tree = ckptr.restore(path)
        meta_path = os.path.join(path, "il_meta.json")
        il_meta = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                il_meta = json.load(f)
        return tree, il_meta

    # ------------------------------------------------------------------
    def auto_delete(self, state: int, current_epoch: int) -> None:
        """Keep epoch%keep_every==0 and the current epoch (params.py:211-222)."""
        if not _is_primary():
            return
        for e in self.epochs(state):
            if e == current_epoch or e % self.keep_every == 0:
                continue
            if e < current_epoch:
                shutil.rmtree(self.epoch_dir(state, e), ignore_errors=True)

    def save_sidecar(self, state: int, name: str, obj: Any) -> str:
        """JSON sidecar per state dir (replaces the reference's pickles:
        similarity.pickle, mas_importance.pickle, persuado_label pickles...)."""
        path = os.path.join(self.state_dir(state), name + ".json")
        if not _is_primary():
            return path
        with open(path, "w") as f:
            json.dump(obj, f, default=_jsonable)
        return path

    def load_sidecar(self, state: int, name: str) -> Optional[Any]:
        path = os.path.join(self.state_dir(state), name + ".json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def save_array_sidecar(self, state: int, name: str, tree) -> str:
        """npz sidecar for array-valued artifacts (MAS importance,
        prototype features)."""
        path = os.path.join(self.state_dir(state), name + ".npz")
        if not _is_primary():
            return path
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
        np.savez(path, **arrays)
        return path

    def load_array_sidecar(self, state: int, name: str, like=None):
        path = os.path.join(self.state_dir(state), name + ".npz")
        if not os.path.exists(path):
            return None
        data = np.load(path)
        if like is None:
            return dict(data)
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = [data[jax.tree_util.keystr(k)] for k, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, leaves)


def _jsonable(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not jsonable: {type(o)}")
