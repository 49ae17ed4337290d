"""Pretrained-backbone import.

The reference loads torchvision ImageNet ResNet weights with strict=False
(/root/reference/retinanet/model.py:636). This environment has no
torchvision and zero egress, so the converter accepts either:

  * a torch state_dict file (``.pt``/``.pth``) with torchvision ResNet key
    names (conv1.weight, layer1.0.conv1.weight, ...), or
  * an ``.npz`` produced by :func:`torch_to_npz` on a machine that has the
    weights.

Mapping (torchvision -> this repo's flax tree):
  conv1/bn1                 -> backbone.conv1 / backbone.bn1
  layer{s}.{i}.conv{k}/bn{k}-> backbone.layer{s}_{i}.conv{k}/bn{k}
  layer{s}.{i}.downsample.0 -> backbone.layer{s}_{i}.downsample_conv
  layer{s}.{i}.downsample.1 -> backbone.layer{s}_{i}.downsample_bn
Conv kernels transpose OIHW -> HWIO. BN: weight->scale, bias->bias,
running_mean/var -> batch_stats.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def torch_to_npz(state_dict_path: str, out_path: str) -> None:
    """Offline helper: torch state_dict (or a reference checkpoint dict
    holding ``model_state_dict``, params.py:307-322) -> flat npz of numpy
    arrays. Torch is needed only at conversion time; the npz loads
    anywhere."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu")
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    np.savez(out_path, **{k: np.asarray(v) for k, v in sd.items()
                          if hasattr(v, "numpy") or isinstance(v, np.ndarray)})


def _map_key(torch_key: str) -> Tuple[Tuple[str, ...], str, str]:
    """torch key -> (flax path under backbone, param name, collection)."""
    parts = torch_key.split(".")

    def bn_entry(prefix, pname):
        if pname == "weight":
            return prefix, "scale", "params"
        if pname == "bias":
            return prefix, "bias", "params"
        if pname == "running_mean":
            return prefix, "mean", "batch_stats"
        if pname == "running_var":
            return prefix, "var", "batch_stats"
        return None

    if parts[0] == "conv1":
        return ("conv1",), "kernel", "params"
    if parts[0] == "bn1":
        e = bn_entry(("bn1", "bn"), parts[1])
        if e:
            return e
    if parts[0].startswith("layer"):
        stage = parts[0]          # layer1..layer4
        block = parts[1]
        name = f"{stage}_{block}"
        rest = parts[2:]
        if rest[0].startswith("conv"):
            return (name, rest[0]), "kernel", "params"
        if rest[0].startswith("bn"):
            e = bn_entry((name, rest[0], "bn"), rest[1])
            if e:
                return e
        if rest[0] == "downsample":
            if rest[1] == "0":
                return (name, "downsample_conv"), "kernel", "params"
            e = bn_entry((name, "downsample_bn", "bn"), rest[2])
            if e:
                return e
    raise KeyError(torch_key)


def load_pretrained_backbone(variables: Dict, path: str) -> Dict:
    """Merge converted torchvision weights into the model variables
    (backbone only, like the reference's strict=False load)."""
    import copy

    import jax.numpy as jnp

    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        raw = torch.load(path, map_location="cpu")
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
        sd = {k: v.numpy() for k, v in raw.items()}

    out = copy.deepcopy(
        {"params": dict(variables["params"]), "batch_stats": dict(variables["batch_stats"])}
    )
    loaded, skipped = 0, 0
    for key, value in sd.items():
        if key.startswith("fc."):
            continue
        if "num_batches_tracked" in key:
            continue
        try:
            path_parts, pname, collection = _map_key(key)
        except KeyError:
            skipped += 1
            continue
        ok = True
        trail = [out[collection]["backbone"]]
        for p in path_parts[:-1]:
            if p not in trail[-1]:
                ok = False
                break
            trail.append(trail[-1][p])
        if not ok or path_parts[-1] not in trail[-1]:
            skipped += 1
            continue
        leaf_parent = trail[-1][path_parts[-1]]
        if pname not in leaf_parent:
            skipped += 1
            continue
        arr = np.asarray(value)
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)   # OIHW -> HWIO
        if leaf_parent[pname].shape != arr.shape:
            skipped += 1
            continue
        leaf_parent[pname] = jnp.asarray(arr, jnp.asarray(leaf_parent[pname]).dtype)
        loaded += 1
    print(f"pretrained backbone: loaded {loaded} tensors, skipped {skipped}")
    return out


# ---------------------------------------------------------------------------
# Full-model import: a checkpoint TRAINED WITH THE REFERENCE -> this framework.
#
# The reference saves ``{'model_state_dict': ...}`` dicts per epoch
# (/root/reference/preprocessing/params.py:307-322) over its composite
# ``ResNet`` module whose submodules are named ``conv1/bn1/layer{1..4}``
# (model.py:281-288), ``fpn.P{3,4,5}_{1,2}/P6/P7_2`` (model.py:50-68),
# ``regressionModel.conv{1..4}/output`` (model.py:98-110) and
# ``classificationModel.conv{1..4}/output`` (model.py:141-153).  Both
# frameworks use the anchor-major output-channel layout (channel = a*C + c,
# model.py:196-200 == heads.py), so output convs copy through directly and a
# reference user can evaluate / keep incrementally training their existing
# checkpoints here.

_FPN_KEY_MAP = {
    "P5_1": "p5_lateral", "P5_2": "p5_smooth",
    "P4_1": "p4_lateral", "P4_2": "p4_smooth",
    "P3_1": "p3_lateral", "P3_2": "p3_smooth",
    "P6": "p6", "P7_2": "p7",
}


def _map_full_key(torch_key: str) -> Tuple[Tuple[str, ...], str, str]:
    """Reference composite-model key -> (flax path, param name, collection)."""
    parts = torch_key.split(".")
    if parts[0] == "fpn":
        sub = _FPN_KEY_MAP[parts[1]]          # KeyError for P5_upsampled etc.
        pname = "kernel" if parts[2] == "weight" else "bias"
        return ("fpn", sub), pname, "params"
    if parts[0] in ("regressionModel", "classificationModel"):
        head = ("regression_head" if parts[0] == "regressionModel"
                else "classification_head")
        if not (parts[1].startswith("conv") or parts[1] == "output"):
            raise KeyError(torch_key)
        pname = "kernel" if parts[2] == "weight" else "bias"
        return (head, parts[1]), pname, "params"
    path, pname, coll = _map_key(torch_key)   # backbone naming is shared
    return ("backbone",) + path, pname, coll


def _load_state_dict(path: str, allow_pickle: bool = False) -> Dict[str, np.ndarray]:
    """Read a torch ``.pt``/``.pth`` (optionally a reference checkpoint dict
    holding ``model_state_dict``) or a flat ``.npz``.

    Reference checkpoints are plain tensor state dicts
    (/root/reference/preprocessing/params.py:307-322), so the safe
    ``weights_only=True`` load covers the advertised use case. Arbitrary
    pickled objects (a whole-module ``torch.save(model)``) only load behind
    the explicit ``allow_pickle=True`` opt-in — unpickling executes code
    from the file."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    try:
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a tensors-only state dict "
                f"(weights_only load failed: {e}); if you trust this file, "
                "pass allow_pickle=True (CLI: --trust_torch_ckpt) to permit "
                "full unpickling, which executes code embedded in the file"
            ) from e
        raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model_state_dict" in raw:
        raw = raw["model_state_dict"]          # params.py:307-322 layout
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    return {k: v.numpy() for k, v in raw.items()}


def load_reference_checkpoint(
    variables: Dict, path: str, strict: bool = True, allow_pickle: bool = False
) -> Dict:
    """Merge a reference-trained full-model checkpoint into flax variables.

    ``strict`` requires every OUR-side param leaf (and BN stat) to be
    covered by the checkpoint — the right default for "switch framework
    mid-experiment"; set False for partial/foreign state dicts.
    """
    import copy

    import jax
    import jax.numpy as jnp

    sd = _load_state_dict(path, allow_pickle=allow_pickle)
    out = copy.deepcopy(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}
    )
    loaded, skipped = 0, []
    touched = set()
    for key, value in sd.items():
        if "num_batches_tracked" in key:
            continue
        try:
            path_parts, pname, collection = _map_full_key(key)
        except KeyError:
            skipped.append(key)
            continue
        node = out[collection]
        trail = [node]
        ok = True
        for p in path_parts:
            if p not in trail[-1]:
                ok = False
                break
            trail.append(trail[-1][p])
        if not ok or pname not in trail[-1]:
            skipped.append(key)
            continue
        arr = np.asarray(value)
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)   # OIHW -> HWIO
        if trail[-1][pname].shape != arr.shape:
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {arr.shape} vs "
                f"model {trail[-1][pname].shape} — wrong depth/num_classes?"
            )
        trail[-1][pname] = jnp.asarray(arr, jnp.asarray(trail[-1][pname]).dtype)
        touched.add((collection,) + path_parts + (pname,))
        loaded += 1

    if strict:
        missing = []
        for coll in ("params", "batch_stats"):
            flat = jax.tree_util.tree_flatten_with_path(out[coll])[0]
            for kp, _ in flat:
                parts = tuple(getattr(k, "key", str(k)) for k in kp)
                if (coll,) + parts not in touched:
                    missing.append(".".join((coll,) + parts))
        if missing:
            raise ValueError(
                f"reference checkpoint left {len(missing)} leaves "
                f"uninitialized (e.g. {missing[:4]}); pass strict=False "
                "to allow a partial load"
            )
    print(f"reference checkpoint: loaded {loaded} tensors, "
          f"skipped {len(skipped)}")
    return out


# ---------------------------------------------------------------------------
# Optimizer / scheduler state interop (continue a reference experiment here)
# ---------------------------------------------------------------------------

_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def _torch_param_names(model_state_dict_keys) -> list:
    """Parameter names in registration order = ``named_parameters()`` order
    (state_dict keys minus the BN buffers — the only buffers the reference
    model registers)."""
    return [k for k in model_state_dict_keys
            if not k.endswith(_BUFFER_SUFFIXES)]


def _index_to_name(ckp: Dict) -> Dict[int, str]:
    """Reference Adam global param index -> torch parameter name.

    The reference builds Adam over two groups (main.py:57-59,
    il_trainer.py:309-311): group 0 = every parameter whose name does not
    contain 'classificationModel.output' (WHITE_LIST_FOR_OPTIM,
    il_trainer.py:29-43, yielded in named_parameters order), group 1 =
    classificationModel.output.{weight,bias}. torch assigns global state
    indices over the concatenation of the groups' param lists; the saved
    ``param_groups[g]['params']`` records them, so we zip those index
    lists against the name lists reconstructed from model_state_dict."""
    names = _torch_param_names(ckp["model_state_dict"].keys())
    g0 = [n for n in names if "classificationModel.output" not in n]
    g1 = [n for n in names if "classificationModel.output" in n]
    groups = ckp["optimizer_state_dict"]["param_groups"]
    if len(groups) != 2 or [len(g["params"]) for g in groups] != [len(g0), len(g1)]:
        raise ValueError(
            "optimizer_state_dict param_groups do not match the reference's "
            "two-group Adam layout (main.py:57-59): got "
            f"{[len(g['params']) for g in groups]} params per group vs "
            f"model-derived {[len(g0), len(g1)]}"
        )
    out = {}
    for idx_list, name_list in zip((groups[0]["params"], groups[1]["params"]),
                                   (g0, g1)):
        out.update(dict(zip(idx_list, name_list)))
    return out


def _graft_adam_moments(opt_state, full_mu, full_nu, count):
    """Replace every ScaleByAdamState's (mu, nu, count) in an optax state
    tree, preserving MaskedNode placeholders (multi_transform masks each
    group's moments to its own leaves)."""
    import jax
    import jax.numpy as jnp
    import optax

    def is_masked(x):
        return isinstance(x, optax.MaskedNode)

    def graft_tree(masked_tree, full_tree):
        return jax.tree.map(
            lambda m, v: m if is_masked(m) else jnp.asarray(
                np.asarray(v), jnp.asarray(m).dtype),
            masked_tree, full_tree, is_leaf=is_masked,
        )

    def rec(node):
        if hasattr(node, "_fields"):
            if {"count", "mu", "nu"} <= set(node._fields):
                return node._replace(
                    count=jnp.asarray(count, jnp.asarray(node.count).dtype),
                    mu=graft_tree(node.mu, full_mu),
                    nu=graft_tree(node.nu, full_nu),
                )
            return node._replace(**{f: rec(getattr(node, f))
                                    for f in node._fields})
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (tuple, list)):
            return type(node)(rec(v) for v in node)
        return node

    return rec(opt_state)


def load_reference_optimizer(
    opt_state, params, path: str, allow_pickle: bool = False
):
    """Import a reference ``.pt`` checkpoint's Adam moments and scheduler
    LR into an optax state built by ``train.optim.make_optimizer``, so a
    half-finished reference experiment resumes here with its optimizer
    memory intact (reference save format:
    /root/reference/preprocessing/params.py:307-322).

    Returns ``(new_opt_state, info)`` where info carries ``step`` (Adam
    step count), ``last_lr`` (scheduler's current LR, None if no
    scheduler state), and ``loaded``/``skipped`` tensor counts. Raises if
    the file has no ``optimizer_state_dict``.

    Mapping: torch ``exp_avg``/``exp_avg_sq`` -> optax ``mu``/``nu``
    (identical Adam semantics incl. bias correction by step count); conv
    moments transpose OIHW -> HWIO like the weights themselves.
    """
    import jax
    import torch

    try:
        ckp = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # MultiStepLR state_dicts hold a collections.Counter, which the
        # weights_only allowlist can reject — same opt-in as model loads
        if not allow_pickle:
            raise ValueError(
                f"{path} needs full unpickling (scheduler state); pass "
                "allow_pickle=True / --trust_torch_ckpt if you trust it"
            )
        ckp = torch.load(path, map_location="cpu", weights_only=False)
    if "optimizer_state_dict" not in ckp:
        raise ValueError(f"{path} has no optimizer_state_dict "
                         "(model-only checkpoint?)")

    idx_to_name = _index_to_name(ckp)
    flat_params = jax.tree_util.tree_flatten_with_path(params)
    # flax path tuple -> leaf position, for shape checks
    leaves = {tuple(getattr(k, "key", str(k)) for k in kp): v
              for kp, v in flat_params[0]}

    full_mu = jax.tree.map(np.zeros_like, jax.tree.map(np.asarray, params))
    full_nu = jax.tree.map(np.zeros_like, full_mu)
    loaded, skipped = 0, []
    steps = [0]
    for idx, st in ckp["optimizer_state_dict"]["state"].items():
        name = idx_to_name.get(int(idx))
        if name is None:
            skipped.append(str(idx))
            continue
        try:
            path_parts, pname, collection = _map_full_key(name)
        except KeyError:
            skipped.append(name)
            continue
        if collection != "params":
            skipped.append(name)   # BN stats never carry Adam state here
            continue
        key = path_parts + (pname,)
        if key not in leaves:
            skipped.append(name)
            continue
        steps.append(int(st["step"]))
        for src, dst in (("exp_avg", full_mu), ("exp_avg_sq", full_nu)):
            arr = np.asarray(st[src])
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)   # OIHW -> HWIO
            node = dst
            for p in path_parts:
                node = node[p]
            if node[pname].shape != arr.shape:
                raise ValueError(
                    f"optimizer moment shape mismatch for {name}: "
                    f"{arr.shape} vs {node[pname].shape}"
                )
            node[pname] = arr
        loaded += 1

    count = max(steps)
    new_state = _graft_adam_moments(opt_state, full_mu, full_nu, count)

    last_lr = None
    sched = ckp.get("scheduler_state_dict")
    if sched and sched.get("_last_lr"):
        last_lr = float(sched["_last_lr"][0])
        from ..train.optim import set_learning_rate

        new_state = set_learning_rate(new_state, last_lr)

    print(f"reference optimizer: grafted {loaded} moment pairs "
          f"(step {count}), skipped {len(skipped)}"
          + (f", lr {last_lr}" if last_lr is not None else ""))
    return new_state, {"step": count, "last_lr": last_lr,
                       "loaded": loaded, "skipped": skipped}
