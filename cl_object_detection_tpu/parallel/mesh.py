"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.2-2.3: hardcoded
``cuda:0``, no torch.distributed). Here multi-chip is first-class: a
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding over ICI) and an
optional ``model`` axis (head/FPN channel sharding), with XLA inserting the
collectives (psum for gradient reduction) from pjit sharding constraints.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def create_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over all (or the given) devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    num_model = max(1, cfg.num_model)
    num_data = cfg.num_data if cfg.num_data > 0 else n // num_model
    if num_data * num_model != n:
        raise ValueError(f"mesh {num_data}x{num_model} != {n} devices")
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, rest replicated."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch dim sharded over 'data'."""
    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))
    return jax.tree.map(put, batch)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization over ICI/DCN (SURVEY.md §2.3).

    No-op for single-process runs (the common case here); on a multi-host
    slice call this once per host before touching devices. Arguments are
    optional — on TPU pods JAX autodetects them from the environment.
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_batch_from_local(mesh: Mesh, batch):
    """Assemble a GLOBAL batch from this host's local shard.

    Each host loads only its slice of the global batch (host-local data
    loading, SURVEY.md §2.3); ``jax.make_array_from_process_local_data``
    stitches the per-process pieces into one global ``jax.Array`` sharded
    over the ``data`` axis. Single-process this equals :func:`shard_batch`.
    """
    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim), x
        )
    return jax.tree.map(put, batch)
