"""AOT deployment artifacts: freeze the trained predict path into a
serialized StableHLO program (``jax.export``) that runs WITHOUT the
framework's model code.

Beyond the reference (which deploys by shipping the research repo +
``torch.load`` of a full pickled model, visualize_single_image.py:95):
here ``cli.export`` compiles checkpoint + architecture + post-process
(decode -> top-k -> NMS) into ONE self-contained artifact — the weights
are baked in as program constants — and ``cli.serve --from_export`` (or
any ``jax.export.deserialize`` caller) serves it with zero access to the
checkpoint tree or the Python model classes. This is the TPU-production
deployment story: export once on the training side, ship a directory of
(program bytes + meta.json) to the fleet.

The artifact contract (meta.json) records everything the serving side
needs to build input frames: canonical frame H/W, host-side layout
(rgb / s2d / fused-stem 4x4 s2d), transfer dtype, batch size, and class
count. Exported programs are shape-static by design — one artifact per
(batch, frame), matching the framework's one-compiled-program discipline.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

ARTIFACT_BLOB = "predict.stablehlo"
ARTIFACT_META = "meta.json"


@dataclasses.dataclass
class ServingBundle:
    """Everything needed to rebuild the trained predict path from a run
    directory (checkpoint tree + the params.json written by cli.train)."""

    model: Any
    variables: Dict[str, Any]
    mcfg: Any                 # ModelConfig
    height: int
    width: int
    num_classes: int
    s2d: bool                 # host 2x2 space-to-depth frames (s2d_stem)
    fused: bool               # host 4x4 space-to-depth frames (fused_stem)
    il_meta: Optional[Dict[str, Any]]

    def frame_shape(self) -> Tuple[int, int, int]:
        """Per-image host frame shape for this run's stem layout."""
        if self.s2d:
            return (self.height // 2, self.width // 2, 12)
        if self.fused:
            return (self.height // 4, self.width // 4, 64)
        return (self.height, self.width, 3)


def load_serving_bundle(
    root_dir: str,
    scenario: Sequence[str],
    state: int,
    epoch: int = -1,
    depth: Optional[int] = None,
) -> ServingBundle:
    """Reconstruct the FULL trained architecture + weights from a run dir.

    cli.train writes params.json in the START state's dir only — when
    loading a later IL state, fall back through earlier state dirs.
    Depth alone is not enough for non-default fpn_channels/head_layers —
    the whole ModelConfig is rebuilt from the run's params.json.
    """
    import jax
    import jax.numpy as jnp

    from ..config import DataConfig, ModelConfig
    from ..models import create_retinanet
    from ..utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(root_dir, "checkpoint"), scenario)
    tree, il_meta = ckpt.restore(state, epoch)
    num_classes = il_meta["num_classes"] if il_meta else 20

    run_cfg: Dict[str, Any] = {}
    for s in range(state, -1, -1):
        try:
            with open(os.path.join(ckpt.state_dir(s), "params.json")) as f:
                run_cfg = json.load(f)
            break
        except (OSError, ValueError):
            continue
    run_model = dict(run_cfg.get("model", {}))
    if depth is not None:
        run_model["depth"] = depth
    mc_fields = {f.name for f in dataclasses.fields(ModelConfig)}
    mcfg = ModelConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                          for k, v in run_model.items() if k in mc_fields})
    model = create_retinanet(mcfg, num_classes)
    variables = {
        "params": jax.tree.map(jnp.asarray, tree["params"]),
        "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"]),
    }
    # fail fast with a structural diff if the reconstructed architecture
    # doesn't match the checkpoint (e.g. a --depth override or a hand-
    # edited params.json) — otherwise the mismatch surfaces as a cryptic
    # flax scope error at first predict. eval_shape traces without
    # compiling, so this costs milliseconds.
    expect = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32)))
    want = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(expect["params"])[0]}
    have = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    if want != have:
        missing = sorted(want - have)[:5]
        extra = sorted(have - want)[:5]
        raise ValueError(
            f"checkpoint does not match the reconstructed architecture "
            f"(ModelConfig depth={mcfg.depth}, num_classes={num_classes}): "
            f"{len(want - have)} params missing from the checkpoint "
            f"(e.g. {missing}), {len(have - want)} unexpected "
            f"(e.g. {extra}) — check params.json / --depth")
    run_data = run_cfg.get("data", {})
    s2d = bool(run_data.get("s2d_stem", False))
    fused = bool(run_data.get("fused_stem", False)) and not s2d
    return ServingBundle(
        model=model,
        variables=variables,
        mcfg=mcfg,
        height=int(run_data.get("height", DataConfig.height)),
        width=int(run_data.get("width", DataConfig.width)),
        num_classes=num_classes,
        s2d=s2d,
        fused=fused,
        il_meta=il_meta,
    )


def export_predict(
    bundle: ServingBundle,
    batch: int,
    score_thresh: float = 0.05,
    topk_method: str = "exact",
    quantize: bool = False,
    transfer_dtype: str = "uint8",
    platforms: Optional[Sequence[str]] = None,
    bic: bool = False,
):
    """Trace + lower the full predict path with the weights closed over as
    constants; returns (serialized bytes, meta dict).

    The exported callable's signature is images(batch, *frame_shape) ->
    {"boxes": (B,D,4), "scores": (B,D), "labels": (B,D), "valid": (B,D)}
    — a plain dict so deserializing callers need no framework pytrees.
    """
    import jax
    import numpy as np

    from ..config import PredictConfig
    from .predictor import make_predict_fn

    bic_correct = None
    if bic:
        from ..il.bic import bic_correct_from_meta

        # per-state new-class counts from the run config's scenario:
        # numeric entries contribute N classes, named entries 1
        # (states.ILStates semantics; ids themselves aren't needed here).
        # il_meta["config"] is the TrainConfig.to_json() STRING.
        raw_cfg = (bundle.il_meta or {}).get("config", "{}")
        cfg_dict = json.loads(raw_cfg) if isinstance(raw_cfg, str) else raw_cfg
        scenario = cfg_dict.get("il", {}).get("scenario", [])
        counts = [int(e) if str(e).isdigit() else 1 for e in scenario]
        if counts:
            bic_correct = bic_correct_from_meta(
                bundle.il_meta, counts, bundle.num_classes)
        if bic_correct is None:
            raise ValueError("--bic: checkpoint carries no usable BiC state")

    predict = make_predict_fn(
        bundle.model,
        PredictConfig(score_thresh=score_thresh, topk_method=topk_method,
                      quantize=quantize),
        bic_correct=bic_correct,
    )
    variables = bundle.variables

    def fn(images):
        det = predict(variables, images)
        return {"boxes": det.boxes, "scores": det.scores,
                "labels": det.labels, "valid": det.valid}

    frame = bundle.frame_shape()
    dtype = np.uint8 if transfer_dtype == "uint8" else np.float32
    spec = jax.ShapeDtypeStruct((batch,) + frame, dtype)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jax.export.export(jax.jit(fn), **kwargs)(spec)
    meta = {
        "batch": batch,
        "frame_shape": list(frame),
        "height": bundle.height,
        "width": bundle.width,
        "s2d": bundle.s2d,
        "fused": bundle.fused,
        "transfer_dtype": transfer_dtype,
        "num_classes": bundle.num_classes,
        "score_thresh": score_thresh,
        "topk_method": topk_method,
        "quantize": quantize,
        "bic": bic_correct is not None,
        "depth": bundle.mcfg.depth,
        "platforms": list(exported.platforms),
        "knowing_class_ids": (bundle.il_meta or {}).get("knowing_class_ids"),
    }
    return exported.serialize(), meta


def save_artifact(out_dir: str, blob: bytes, meta: Dict[str, Any]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_BLOB), "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, ARTIFACT_META), "w") as f:
        json.dump(meta, f, indent=1)


def load_artifact(out_dir: str):
    """Load an exported artifact; returns (fn, meta) where fn(images) ->
    dict of numpy arrays. Needs only jax.export — no model code, no
    checkpoint tree."""
    import jax
    import numpy as np

    with open(os.path.join(out_dir, ARTIFACT_META)) as f:
        meta = json.load(f)
    with open(os.path.join(out_dir, ARTIFACT_BLOB), "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))

    def fn(images):
        return {k: np.asarray(v) for k, v in exported.call(images).items()}

    return fn, meta
