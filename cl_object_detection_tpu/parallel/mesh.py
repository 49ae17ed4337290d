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
