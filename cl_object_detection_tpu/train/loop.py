"""The state/epoch/iteration loop.

Re-implements ``train_process`` (/root/reference/train/train.py:152-337):

  state loop -> epoch loop -> iteration loop, with
  * warm-up freeze control per epoch;
  * per-iteration A-GEM replay-gradient refresh (train.py:233-234 — the
    reference recomputes it EVERY iteration; AGEMConfig.refresh_every
    reproduces or relaxes that);
  * replay either interleaved into the epoch (``mix_data`` schedule,
    train.py:199-271) or as a tail pass (train.py:275-298), with the
    Adam-beta1 swap around replay batches;
  * BiC bias training after each epoch (train.py:300-302);
  * scheduler step, checkpoint save, retention cleanup;
  * optional final_correction loop re-running enhance_error until clean
    (train.py:323-331);
  * ``next_state`` between states.
"""
from __future__ import annotations

import random
import time
from typing import Dict, List, Optional

import numpy as np

from ..utils.recorder import Recorder
from .trainer import ILTrainer


def train_process(trainer: ILTrainer, recorder: Optional[Recorder] = None,
                  log_every: int = 10) -> None:
    cfg = trainer.cfg
    start_state = cfg.il.start_state
    end_state = cfg.il.end_state
    if end_state is None or end_state < start_state:
        end_state = start_state
    start_epoch = cfg.start_epoch or 1
    end_epoch = cfg.end_epoch or cfg.schedule.new_state_epoch
    if recorder is None:
        recorder = Recorder(enabled=False)


    for cur_state in range(start_state, end_state + 1):
        if cur_state != start_state:
            start_epoch = 1
            end_epoch = cfg.schedule.new_state_epoch
        trainer.end_epoch = end_epoch
        print(f"State {cur_state}: epochs {start_epoch}..{end_epoch}, "
              f"{len(trainer.dataset_train)} train images")

        for cur_epoch in range(start_epoch, end_epoch + 1):
            # profile the SECOND epoch of the first trained state (epoch 1
            # is compile-dominated) — or the only epoch if there is just
            # one. Guarded start/stop: cli.train closes a trace left open
            # by a mid-epoch exception.
            profile_epoch = (start_epoch + 1 if end_epoch > start_epoch
                             else start_epoch)
            profiling = (cfg.profile_dir and cur_state == start_state
                         and cur_epoch == profile_epoch)
            if profiling:
                from ..utils.profiling import start_trace_guarded

                start_trace_guarded(cfg.profile_dir)
                print(f"profiler: tracing epoch {cur_epoch} -> {cfg.profile_dir}")
            trainer.cur_epoch = cur_epoch
            trainer.train_loader.set_epoch(cur_epoch)
            if trainer.replay_loader is not None:
                trainer.replay_loader.set_epoch(cur_epoch)
            trainer.warm_up(cur_epoch)
            not_warm_classifier = trainer._warm_kind != "output"

            epoch_loss: List[float] = []
            t_epoch = time.time()

            num_training_iter = len(trainer.train_loader)
            replay_exist = (not cfg.il.agem.enabled
                            and trainer.replay_loader is not None)
            do_mix = (cfg.il.replay.mix_data
                      and cur_epoch > cfg.il.replay.mix_data_start)

            # mix_data schedule (train.py:199-222)
            replay_iter = None
            do_replay_ids: Dict[int, int] = {}
            # only build the replay iterator when it will actually be
            # consumed (warm-'output' epochs skip replay) — an unconsumed
            # iterator would leave its prefetch worker blocked forever.
            # RNG keyed by (seed, state, epoch): a resumed run draws the
            # SAME interleave schedule as the original (exact-resume
            # contract; a run-lifetime RNG would have advanced differently)
            if replay_exist and do_mix and not_warm_classifier:
                rng = random.Random(f"{cfg.seed}:{cur_state}:{cur_epoch}")
                num_replay_iter = len(trainer.replay_loader)
                if num_replay_iter <= num_training_iter:
                    ids = rng.sample(range(num_training_iter), k=num_replay_iter)
                    do_replay_ids = {i: 1 for i in ids}
                else:
                    do_replay_ids = {i: 1 for i in range(num_training_iter)}
                    rem = num_replay_iter - num_training_iter
                    i = 0
                    while rem:
                        i = (i + 1) % num_training_iter
                        do_replay_ids[i] += 1
                        rem -= 1
                replay_iter = iter(trainer.replay_loader)

            agem_counter = 0
            pending = None   # one-batch-delayed metric sync keeps the
                             # device pipelined (host fetch costs ~30ms RTT)

            def flush_pending():
                nonlocal pending
                if pending is None:
                    return
                it, t0, dev_metrics, prefix = pending
                metrics = {k: float(v) for k, v in dev_metrics.items()}
                epoch_loss.append(metrics["total_loss"])
                # the 500-deep running-loss window (reference train.py:75,
                # printed as "Running loss" and persisted in the ckpt);
                # total_loss is the full batch loss — the step divides the
                # accumulated GRADS by every_iter, not the loss metric
                trainer.loss_hist.append(metrics["total_loss"])
                recorder.add_iter_loss(
                    cur_state,
                    {f"{prefix}{k}": v for k, v in metrics.items()}
                    if prefix else metrics,
                )
                if it % log_every == 0:
                    keys = " | ".join(
                        f"{k}: {v:.4f}" for k, v in sorted(metrics.items())
                    )
                    print(f"Epoch {cur_epoch:2d} | Iter {it:3d} | {keys} "
                          f"| Running loss: {np.mean(trainer.loss_hist):.5f} "
                          f"| {time.time() - t0:.2f}s")
                pending = None

            for iter_num, batch in enumerate(trainer.train_loader):
                trainer.set_replay_beta(False)
                if cfg.il.agem.enabled and trainer.agem is not None:
                    if agem_counter % max(cfg.il.agem.refresh_every, 1) == 0:
                        trainer.agem.compute_replay_grad(trainer.variables())
                    agem_counter += 1

                t0 = time.time()
                dev_metrics = trainer.run_batch(batch, is_replay=False,
                                                sync_metrics=False)
                flush_pending()
                pending = (iter_num, t0, dev_metrics, "")

                # interleaved replay (train.py:250-271)
                if (replay_exist and not_warm_classifier and do_mix
                        and iter_num in do_replay_ids):
                    flush_pending()
                    trainer.set_replay_beta(True)
                    for _ in range(do_replay_ids[iter_num]):
                        try:
                            rbatch = next(replay_iter)
                        except StopIteration:
                            break
                        t0r = time.time()
                        m = trainer.run_batch(rbatch, is_replay=True,
                                              sync_metrics=False)
                        flush_pending()
                        pending = (iter_num, t0r, m, "replay_")

            flush_pending()

            # tail replay pass — reference gate (train.py:275): fires when
            # mix_data is OFF or cur_epoch < mix_data_start; at exactly
            # cur_epoch == mix_data_start NEITHER mix nor tail runs
            if (replay_exist and not_warm_classifier
                    and (not cfg.il.replay.mix_data
                         or cur_epoch < cfg.il.replay.mix_data_start)):
                trainer.set_replay_beta(True)
                for it_r, rbatch in enumerate(trainer.replay_loader):
                    t0r = time.time()
                    m = trainer.run_batch(rbatch, is_replay=True,
                                          sync_metrics=False)
                    flush_pending()
                    pending = (it_r, t0r, m, "replay_")
                flush_pending()
                trainer.set_replay_beta(False)

            # BiC bias training (train.py:300-302)
            if trainer.bic is not None and cur_state > 0:
                bic_loss = trainer.bic.train_epoch(trainer.variables())
                print(f"BiC epoch loss: {bic_loss:.4f}")

            trainer.step_scheduler(cur_epoch)
            if cur_epoch % max(cfg.save_every, 1) == 0 or cur_epoch == end_epoch:
                trainer.save(cur_epoch, epoch_loss)
            if cur_epoch % 5 == 0:
                trainer.ckpt.auto_delete(cur_state, cur_epoch)
            recorder.end_epoch(cur_state, cur_epoch)
            print(f"Epoch {cur_epoch} done: mean loss "
                  f"{np.mean(epoch_loss) if epoch_loss else float('nan'):.4f} "
                  f"({time.time() - t_epoch:.1f}s)")
            if profiling:
                from ..utils.profiling import stop_trace_guarded

                stop_trace_guarded()
                print(f"profiler: trace written to {cfg.profile_dir}")

        # final correction (train.py:323-331)
        if (not cfg.il.agem.enabled and trainer.replay_loader is not None
                and cfg.il.final_correction and cfg.il.replay.enhance_error):
            print("Start final correction")
            _final_correction(trainer)
            trainer.save(end_epoch)

        if cur_state != end_state:
            trainer.next_state()
            recorder.next_state()

    # drain any in-flight async checkpoint before returning — a daemon
    # writer must not be killed mid-write at interpreter exit
    trainer.ckpt.wait()


def _final_correction(trainer: ILTrainer, max_rounds: int = 20) -> None:
    """Re-run replay passes until the enhance_error term is clean
    (train.py:118-131, 323-331) — bounded, unlike the reference's
    potentially-infinite while loop. Each pass backprops ONLY the
    enhance_error term (correction_new_class does
    ``loss = losses['enhance_loss']``) with a plain per-batch optimizer
    step — no focal/distill terms, no accumulation, no grad clip."""
    for _ in range(max_rounds):
        dirty = False
        for batch in trainer.replay_loader:
            m = trainer.run_batch(batch, is_replay=True, correction=True)
            if m.get("enhance_loss", 0.0) > 0:
                dirty = True
        if not dirty:
            return
