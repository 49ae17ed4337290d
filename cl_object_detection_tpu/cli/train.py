"""Training CLI — the reference's ``main.py`` equivalent.

    python -m cl_object_detection_tpu.cli.train \
        --scenario 15 1 --start_state 0 --distill true --sample_num 10 ...

Flag surface mirrors /root/reference/main.py:85-180; dataset layout is
<root_dir>/<dataset>/{train,test}.json + images/ (or explicit --train_json
/ --image_dir). Optionally chains validation (--val true), like
main.py:231-235.
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    from .common import (
        add_train_flags,
        args_to_config,
        maybe_force_cpu,
        resolve_dataset_paths,
    )

    add_train_flags(parser)
    a = parser.parse_args(argv)
    maybe_force_cpu(a)
    cfg = args_to_config(a)

    # multi-host init must precede any device use (SURVEY.md §2.3); no-op
    # unless distributed flags are set (TPU pods autodetect them)
    if a.coordinator_address or (a.num_processes and a.num_processes > 1):
        from ..parallel.mesh import init_distributed

        init_distributed(a.coordinator_address, a.num_processes, a.process_id)

    if cfg.debug:
        # the reference's --debug raised instead of swallowing exceptions
        # (train.py:102-111); we already fail fast — here --debug true adds
        # NaN tripwires on every jitted function
        import jax

        jax.config.update("jax_debug_nans", True)

    from ..train.loop import train_process
    from ..train.trainer import ILTrainer
    from ..utils.recorder import Recorder

    train_json, image_dir = resolve_dataset_paths(a, "train")
    trainer = ILTrainer(cfg, train_json, image_dir, workdir=a.root_dir)

    if a.print_il_info:
        # main.py:223-225 prints the IL params + state table before training
        from .common import print_il_info

        print_il_info(cfg, trainer.states)

    # dump config next to checkpoints (replaces params.txt/il_hparams.pickle,
    # params.py:412-446)
    cfg_path = os.path.join(trainer.ckpt.state_dir(cfg.il.start_state), "params.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    recorder = Recorder(
        log_root=os.path.join(a.root_dir, "runs"),
        scenario_tag="_".join(str(s) for s in cfg.il.scenario),
        description=cfg.description,
        enabled=cfg.record,
    )
    # resume (main.py:67-71): start_epoch > 1 restores that state's ckpt.
    # With --save_every k>1 the exact epoch may be missing — fall back to
    # the newest saved epoch <= start_epoch-1 and restart the loop there.
    if a.start_epoch and a.start_epoch > 1:
        actual = trainer.ckpt.nearest_epoch(
            cfg.il.start_state, a.start_epoch - 1
        )
        if actual is None:
            raise FileNotFoundError(
                f"--start_epoch {a.start_epoch}: no checkpoint at or below "
                f"epoch {a.start_epoch - 1} for state {cfg.il.start_state}"
            )
        if actual != a.start_epoch - 1:
            print(f"--start_epoch {a.start_epoch}: epoch {a.start_epoch - 1} "
                  f"not saved; resuming from epoch {actual}")
            cfg = cfg.replace(start_epoch=actual + 1)
            trainer.cfg = cfg
        trainer.resume(cfg.il.start_state, actual)

    try:
        train_process(trainer, recorder)
    finally:
        # close a profiler trace left open by a mid-epoch exception
        from ..utils.profiling import stop_trace_guarded

        stop_trace_guarded()
        recorder.close()

    if cfg.val_after_train:
        from .validate import run_validation

        # mirror train_process's clamp: end_state < start_state trains
        # only start_state, so that's the state to validate
        end_state = cfg.il.end_state if cfg.il.end_state is not None else cfg.il.start_state
        end_state = max(end_state, cfg.il.start_state)
        last = trainer.ckpt.latest_epoch(end_state)
        if last is None:
            print(f"warning: no checkpoint for state {end_state}; "
                  "skipping chained validation")
        else:
            run_validation(a, state=end_state, epochs=[last])


if __name__ == "__main__":
    main()
