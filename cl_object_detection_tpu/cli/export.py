"""Export a trained checkpoint as a self-contained AOT serving artifact.

    python -m cl_object_detection_tpu.cli.export --root_dir <run> \
        --scenario 20 --state 0 [--epoch -1] [--batch 8] \
        [--platforms tpu cpu] --out <artifact_dir>

Freezes the FULL predict path (architecture reconstructed from the run's
params.json + weights baked in as program constants + decode/top-k/NMS
post-process) into serialized StableHLO via ``jax.export``. The artifact
directory (predict.stablehlo + meta.json) is served by
``cli.serve --from_export <dir>`` — or by any process that can call
``jax.export.deserialize`` — with no access to the checkpoint tree or
this framework's model code. Beyond the reference, which "deploys" by
pickling the whole nn.Module (visualize_single_image.py:95).

One artifact per (batch, frame): exported programs are shape-static,
matching the framework's one-compiled-program discipline.
"""
from __future__ import annotations

import argparse


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root_dir", default=".")
    p.add_argument("--scenario", nargs="+", default=["20"])
    p.add_argument("--state", type=int, default=0)
    p.add_argument("--epoch", type=int, default=-1)
    p.add_argument("--depth", type=int, default=None,
                   help="override the backbone depth from params.json")
    p.add_argument("--batch", type=int, default=8,
                   help="static batch size baked into the artifact")
    p.add_argument("--score_thresh", type=float, default=0.05)
    p.add_argument("--topk_method", default="exact",
                   choices=["exact", "approx"])
    p.add_argument("--quantize", action="store_true",
                   help="int8 dynamic-PTQ convs baked into the program")
    p.add_argument("--bic", action="store_true",
                   help="bake the checkpoint's BiC bias correction in")
    p.add_argument("--transfer_dtype", default="uint8",
                   choices=["float32", "uint8"],
                   help="input dtype of the exported program (uint8 = "
                        "raw frames + on-device normalization)")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms, e.g. --platforms tpu cpu; "
                        "default: the current default backend only")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--cpu", action="store_true")
    return p


def main(argv=None):
    a = get_parser().parse_args(argv)
    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    import os

    from ..eval.deploy import (export_predict, load_serving_bundle,
                               save_artifact)

    bundle = load_serving_bundle(
        a.root_dir, a.scenario, a.state, a.epoch, a.depth)
    blob, meta = export_predict(
        bundle,
        batch=a.batch,
        score_thresh=a.score_thresh,
        topk_method=a.topk_method,
        quantize=a.quantize,
        transfer_dtype=a.transfer_dtype,
        platforms=a.platforms,
        bic=a.bic,
    )
    save_artifact(a.out, blob, meta)
    print(f"exported {len(blob) / 1e6:.1f} MB artifact to "
          f"{os.path.abspath(a.out)} (R{meta['depth']}, batch {a.batch}, "
          f"frame {meta['height']}x{meta['width']}, "
          f"platforms {meta['platforms']})")


if __name__ == "__main__":
    main()
