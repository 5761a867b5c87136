"""Transcription metrics: aggregate + per-label P/R/F.

Parity with `eval.py:233-305`: onset-only matching (tolerance 0.05 s),
pitches scaled x1000 with 1-cent pitch tolerance (effectively exact pitch),
empty-reference/estimate edge cases, the `exclude_ref_empty` flag suppressing
false positives on empty-reference items, and ADTOF per-label slicing that
skips the "Other" class.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from adt_str_tpu.ops.matching import match_notes
from adt_str_tpu.utils.mappings import ADTOF_LABEL_MAPPING


def compute_metrics(
    ref_notes, est_notes, exclude_ref_empty: bool = False
) -> tuple[int, int, int]:
    """-> (TP, FN, FP) for one item (`compute_metrics`, eval.py:233-273)."""
    ref_notes = np.asarray(ref_notes, dtype=np.float64).reshape(-1, 4) if len(ref_notes) else np.zeros((0, 4))
    est_notes = np.asarray(est_notes, dtype=np.float64).reshape(-1, 4) if len(est_notes) else np.zeros((0, 4))
    if len(ref_notes) == 0 and len(est_notes) == 0:
        return 0, 0, 0
    if len(ref_notes) == 0:
        return 0, 0, (len(est_notes) if not exclude_ref_empty else 0)
    if len(est_notes) == 0:
        return 0, len(ref_notes), 0
    matching = match_notes(
        ref_notes[:, 0:2],
        ref_notes[:, 2] * 1000,
        est_notes[:, 0:2],
        est_notes[:, 2] * 1000,
        onset_tolerance=0.05,
        offset_ratio=None,
        pitch_tolerance=1.0,
    )
    tp = len(matching)
    return tp, len(ref_notes) - tp, len(est_notes) - tp


def compute_per_label_metrics(
    pred_notes, gt_notes, per_label_metrics: dict, exclude_ref_empty: bool = False
) -> dict:
    """Accumulate per-ADTOF-class TP/FN/FP (`compute_per_label_metrics`,
    eval.py:276-305). FP suppression applies only when the *full* reference is
    empty, not per-label slices.

    Parity note: the ADTOF class table is used UNCONDITIONALLY, exactly like
    the reference (`eval.py:287` instantiates `ADTOF_label_mapping` regardless
    of the tokenizer mode) — with a GM-mode tokenizer, notes on GM-custom
    pitches outside the 8 ADTOF classes fall out of every per-label bucket
    and e.g. GM 48 is reported under "CY + RD". The aggregate "all" row and
    the confusion matrix (which does switch tables) are unaffected."""
    exclude_fp_for_slices = exclude_ref_empty and len(gt_notes) == 0
    pred_notes = np.asarray(pred_notes).reshape(-1, 4) if len(pred_notes) else np.zeros((0, 4))
    gt_notes = np.asarray(gt_notes).reshape(-1, 4) if len(gt_notes) else np.zeros((0, 4))
    for pitch, label in ADTOF_LABEL_MAPPING.items():
        if label == "Other":
            continue
        pred_label = pred_notes[pred_notes[:, 2] == pitch] if len(pred_notes) else []
        gt_label = gt_notes[gt_notes[:, 2] == pitch] if len(gt_notes) else []
        tp, fn, fp = compute_metrics(gt_label, pred_label, exclude_fp_for_slices)
        per_label_metrics[label]["tp"] += tp
        per_label_metrics[label]["fn"] += fn
        per_label_metrics[label]["fp"] += fp
    return per_label_metrics


def aggregate_metrics(tp: int, fn: int, fp: int) -> dict[str, float]:
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f_measure = (
        2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    )
    return {"precision": precision, "recall": recall, "f_measure": f_measure}


def new_per_label_accumulator() -> dict:
    return defaultdict(lambda: defaultdict(int))
