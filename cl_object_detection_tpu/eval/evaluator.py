"""Evaluation orchestration: batched predict -> COCO-json results ->
per-class AP/recall, with the reference's artifact layout.

Replaces the reference ``Evaluator``/``multi_evaluation``
(/root/reference/evaluator.py:27-426). The reference parallelized
batch-size-1 GPU inference with a thread pool; here one jitted batched
predict saturates the chip, so the orchestration is a simple loop.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..config import DataConfig, PredictConfig
from ..data.coco import CocoJson
from ..data.dataset import ILDataset
from ..data.loader import BatchLoader
from ..states import ILStates
from .coco_eval import CocoProtocolEval, EvalResult
from .predictor import detections_to_coco, make_predict_fn, make_sharded_predict_fn


def _first_occurrence_slots(batch, seen):
    """(keep_slots, batch_new_ids): one True slot per image — the static
    loader wrap-fills short canonical-frame groups by REPEATING images
    WITHIN a batch, so both cross-batch and in-batch repeats must emit
    rows from exactly one slot (else duplicate COCO rows corrupt AP)."""
    keep = []
    batch_seen = set()
    for i in batch.image_ids.tolist():
        keep.append(i >= 0 and i not in seen and i not in batch_seen)
        batch_seen.add(i)
    batch_seen.discard(-1)
    return keep, batch_seen


class Evaluator:
    """Evaluate a model checkpoint on one IL state's test split."""

    def __init__(
        self,
        coco: CocoJson,
        states: ILStates,
        image_dir: str,
        data_cfg: DataConfig,
        predict_cfg: PredictConfig,
        state_index: int = 0,
        eval_on_train: bool = False,
    ):
        self.coco = coco
        self.states = states
        self.state_index = state_index
        self.predict_cfg = predict_cfg
        self.data_cfg = data_cfg
        split = "train" if eval_on_train else "test"
        self.dataset = ILDataset(
            coco, states, image_dir, split=split, start_state=state_index,
            use_all_class=True,
        )
        self.loader = BatchLoader(
            self.dataset, data_cfg, shuffle=False, augment=False,
            drop_last=False,
        )
        self.label_to_cat = states.inverse_label_map()

    # ------------------------------------------------------------------
    def predict_dataset(self, model, variables, progress: bool = False,
                        mesh=None, bic_correct=None) -> List[dict]:
        """Run batched inference over the whole split; returns COCO result
        rows (deduped — the static loader wraps short batches).

        ``mesh``: optional device mesh — shards each batch over the
        ``data`` axis for multi-chip DP eval (the batch size must be a
        multiple of the data-axis size; same results, N-chip rate).

        ``bic_correct``: optional logits->logits closure (BiC bias
        correction, il.bic.bic_correct_from_meta) applied pre-sigmoid like
        the reference Bic_Evaluator (evaluator.py:305-308, 323-324)."""
        if mesh is not None:
            predict = make_sharded_predict_fn(model, self.predict_cfg, mesh,
                                              bic_correct=bic_correct)
        else:
            predict = make_predict_fn(model, self.predict_cfg,
                                      bic_correct=bic_correct)
        seen: set = set()
        results: List[dict] = []
        it = self.loader
        if progress:
            import tqdm

            it = tqdm.tqdm(it, total=len(self.loader))
        for batch in it:
            det = predict(variables, batch.images)
            keep, batch_seen = _first_occurrence_slots(batch, seen)
            results.extend(detections_to_coco(
                det, batch, self.label_to_cat, self.predict_cfg.score_thresh,
                keep_slots=keep,
            ))
            seen |= batch_seen
        return results

    def predict_dataset_multi(
        self,
        model,
        variables_by_key: Dict,
        progress: bool = False,
        mesh=None,
        bic_correct_by_key: Optional[Dict] = None,
    ) -> Dict[int, List[dict]]:
        """Evaluate SEVERAL checkpoints in one pass over the data.

        The reference thread-pools epochs x splits on one GPU
        (evaluator.py:383-426) because its predict is batch-size-1; here
        the host decode pipeline is the repeated cost, so each decoded
        batch is pushed through every epoch's weights before moving on —
        one decode pass total, E jitted predict calls per batch. ONE
        compiled program is shared by every epoch (weights are inputs;
        the BiC corrections — bic_correct_from_meta closures exposing
        .scale/.offset — ride in as per-class runtime vectors, identity
        for uncorrected epochs), so the 20s–5min remote TPU compile is
        paid once, not once per epoch."""
        bic_correct_by_key = bic_correct_by_key or {}
        bcs = [bic_correct_by_key.get(k) for k in variables_by_key]
        vectorizable = all(
            b is None or getattr(b, "scale", None) is not None for b in bcs
        )
        fns = {}
        if vectorizable:
            if mesh is not None:
                shared = make_sharded_predict_fn(model, self.predict_cfg, mesh)
            else:
                shared = make_predict_fn(model, self.predict_cfg)
            num_knowing = self.states[self.state_index].num_knowing_class
            identity = (np.ones(num_knowing, np.float32),
                        np.zeros(num_knowing, np.float32))
            for key in variables_by_key:
                bc = bic_correct_by_key.get(key)
                scale, offset = (bc.scale, bc.offset) if bc else identity
                fns[key] = (lambda v, im, s=scale, o=offset:
                            shared(v, im, s, o))
        else:  # custom correction closures: one program per epoch
            for key in variables_by_key:
                bc = bic_correct_by_key.get(key)
                if mesh is not None:
                    fns[key] = make_sharded_predict_fn(
                        model, self.predict_cfg, mesh, bic_correct=bc)
                else:
                    fns[key] = make_predict_fn(model, self.predict_cfg,
                                               bic_correct=bc)
        seen: set = set()
        results: Dict[int, List[dict]] = {k: [] for k in variables_by_key}
        it = self.loader
        if progress:
            import tqdm

            it = tqdm.tqdm(it, total=len(self.loader))
        for batch in it:
            keep, batch_seen = _first_occurrence_slots(batch, seen)
            for key, variables in variables_by_key.items():
                det = fns[key](variables, batch.images)
                results[key].extend(detections_to_coco(
                    det, batch, self.label_to_cat,
                    self.predict_cfg.score_thresh, keep_slots=keep,
                ))
            seen |= batch_seen
        return results

    def evaluate(self, results: List[dict], ignore_other_img: bool = False) -> EvalResult:
        ev = CocoProtocolEval(self.coco, self.dataset.image_ids)
        cat_ids = self.states[self.state_index].knowing_ids
        return ev.evaluate(results, cat_ids, ignore_other_img=ignore_other_img)

    # ------------------------------------------------------------------
    def run(
        self,
        model,
        variables,
        result_dir: Optional[str] = None,
        epoch: int = 0,
        dataset_name: str = "voc2007",
        bic_correct=None,
    ) -> EvalResult:
        results = self.predict_dataset(model, variables,
                                       bic_correct=bic_correct)
        if result_dir:
            os.makedirs(result_dir, exist_ok=True)
            path = os.path.join(result_dir, f"{dataset_name}_results_epoch{epoch}.json")
            with open(path, "w") as f:
                json.dump(results, f)
        return self.evaluate(results)
