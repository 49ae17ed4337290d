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


def head_tp_spec(path, leaf, axis: str = "model"):
    """Megatron-style tensor-parallel PartitionSpec for one param leaf.

    The detection heads are the widest conv stacks (256-channel trunks over
    5 pyramid levels); their 3x3 trunk convs alternate column-parallel
    (cout sharded — conv1/conv3) and row-parallel (cin sharded, partial
    outputs psum'ed by GSPMD — conv2/conv4), so activations stay sharded
    across the stack with one collective per pair. Output convs, FPN and
    backbone replicate (ResNet-50-scale weights fit every chip; DP is the
    dominant axis — SURVEY.md §2.2).
    """
    keys = [str(getattr(p, "key", "")) for p in path]
    in_head = any(k in ("regression_head", "classification_head") for k in keys)
    conv = next((k for k in keys if k.startswith("conv") and len(k) == 5), None)
    if not (in_head and conv):
        return P()
    col = conv in ("conv1", "conv3")
    if leaf.ndim == 4:                      # (kh, kw, cin, cout)
        return P(None, None, None, axis) if col else P(None, None, axis, None)
    if leaf.ndim == 1:                      # bias
        return P(axis) if col else P()
    return P()


def zero1_extend_spec(base: P, shape, ndata: int, data_axis: str = "data") -> P:
    """ZeRO-1: extend a leaf's PartitionSpec with the ``data`` axis on its
    largest still-unsharded dim that divides evenly. Optimizer moments
    sharded this way cost 1/ndata of the memory; the Adam update runs on
    the shard and GSPMD all-gathers the param updates (the classic
    optimizer-state-sharding recipe — the reference has no distributed
    story at all, SURVEY.md §2.2). Leaves with no divisible free dim (tiny
    biases like the 9·C-channel output bias) replicate unchanged."""
    if ndata <= 1 or not shape:
        return base
    entries = list(base) + [None] * (len(shape) - len(base))
    best = None
    for d, n in enumerate(shape):
        if entries[d] is None and n >= ndata and n % ndata == 0:
            if best is None or n > shape[best]:
                best = d
    if best is None:
        return base
    entries[best] = data_axis
    return P(*entries)


def make_param_constraint(mesh: Mesh, num_model: int = 1,
                          model_axis: str = "model"):
    """``with_sharding_constraint`` pinning freshly-updated params to their
    canonical sharding (replicated, or head-TP) INSIDE the train step.

    Needed under ZeRO-1: the Adam update is computed on data-sharded
    moments, and without an explicit constraint GSPMD may leave the new
    params data-sharded, deferring the all-gather into the next forward
    pass where it can't overlap with the optimizer math."""
    import jax.tree_util as jtu

    repl = replicate(mesh)

    def constrain(params):
        if num_model <= 1:
            return jax.lax.with_sharding_constraint(params, repl)
        return jtu.tree_map_with_path(
            lambda path, x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, head_tp_spec(path, x, model_axis))),
            params,
        )

    return constrain


def shard_train_state(mesh: Mesh, train_state, num_model: int = 1,
                      model_axis: str = "model", zero1: bool = False,
                      data_axis: str = "data"):
    """Place a TrainState on the mesh: head-trunk TP when num_model > 1,
    ZeRO-1 data-axis sharding of the optimizer moments when ``zero1``,
    everything else replicated. opt_state/grad_acc moments follow their
    param's spec (same tree structure per group)."""
    import jax.tree_util as jtu

    ndata = mesh.shape[data_axis] if zero1 else 1
    if num_model <= 1 and ndata <= 1:
        return jax.device_put(train_state, replicate(mesh))

    def put_params_like(tree):
        return jtu.tree_map_with_path(
            lambda path, x: jax.device_put(
                x, NamedSharding(mesh, head_tp_spec(path, x, model_axis))),
            tree,
        )

    repl = replicate(mesh)
    return train_state.replace(
        step=jax.device_put(train_state.step, repl),
        params=put_params_like(train_state.params),
        batch_stats=jax.device_put(train_state.batch_stats, repl),
        # adam mu/nu and the accumulator are param-shaped trees nested in
        # optax NamedTuples; map leaf-wise with a params-path lookup
        opt_state=_put_like_params(mesh, train_state.opt_state,
                                   train_state.params, model_axis,
                                   ndata=ndata, data_axis=data_axis),
        grad_acc=put_params_like(train_state.grad_acc),
        acc_count=jax.device_put(train_state.acc_count, repl),
    )


def _put_like_params(mesh: Mesh, opt_state, params, model_axis: str,
                     ndata: int = 1, data_axis: str = "data"):
    """Shard every param-shaped subtree of an optax state like the params
    (plus the ZeRO-1 data axis when ndata > 1); scalars and anything
    non-param-shaped replicate."""
    import jax.tree_util as jtu

    spec_by_path = {}
    for path, leaf in jtu.tree_flatten_with_path(params)[0]:
        keys = tuple(str(getattr(p, "key", "")) for p in path)
        spec_by_path[keys] = zero1_extend_spec(
            head_tp_spec(path, leaf, model_axis), leaf.shape, ndata, data_axis)

    def rec(node):
        if isinstance(node, dict):
            # a dict subtree that matches the params structure exactly is a
            # moment tree — shard leaf-by-leaf via its own paths
            flat = jtu.tree_flatten_with_path(node)[0]
            paths = {tuple(str(getattr(p, "key", "")) for p in kp)
                     for kp, _ in flat}
            # subset: multi_transform groups hold masked trees whose array
            # leaves cover only that group's params
            if paths and paths <= set(spec_by_path):
                return jtu.tree_map_with_path(
                    lambda path, x: jax.device_put(
                        x, NamedSharding(
                            mesh,
                            spec_by_path[tuple(str(getattr(p, "key", ""))
                                               for p in path)])),
                    node,
                )
            return {k: rec(v) for k, v in node.items()}
        if hasattr(node, "_fields"):
            return node._replace(**{f: rec(getattr(node, f))
                                    for f in node._fields})
        if isinstance(node, (tuple, list)):
            return type(node)(rec(v) for v in node)
        if hasattr(node, "shape"):
            return jax.device_put(node, replicate(mesh))
        return node

    return rec(opt_state)


def put_step_batch(mesh: Optional[Mesh], batch):
    """Device-place one step's (images, boxes, labels): sharded over the
    ``data`` axis via :func:`global_batch_from_local` when a mesh is given
    (multi-host ready), plain device arrays otherwise. The single transfer
    helper shared by the train step, BiC bias training, and A-GEM replay
    gradients — keep them in lockstep."""
    import jax.numpy as jnp

    arrays = (batch.images, batch.boxes, batch.labels)
    if mesh is None:
        return tuple(jnp.asarray(a) for a in arrays)
    return tuple(global_batch_from_local(mesh, a) for a in arrays)


def tool_placers(mesh: Optional[Mesh]):
    """``(put_batch, put_replicated)`` for the IL tool passes.

    Single-process mesh (the v5e-8 single-host case): batch arrays shard
    over the ``data`` axis and trees replicate, so the full-dataset sidecar
    passes (MAS importance, similarity, prototype features, herding
    features, pseudo-labels) run data-parallel with GSPMD inserting the
    cross-chip reductions. Multi-host (or no mesh): identity placement —
    every host computes the full pass locally so sidecars agree without
    collectives (see ILTrainer._proc_shard).
    """
    import jax.numpy as jnp

    if mesh is None or jax.process_count() > 1:
        return (lambda x: jnp.asarray(x)), (lambda t: t)
    repl = replicate(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return put, (lambda t: jax.device_put(t, repl))


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
