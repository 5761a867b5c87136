"""Metric tests: bipartite matcher, TP/FN/FP semantics, confusion matrix."""

import numpy as np

from adt_str_tpu.evaluation.confusion import DrumConfusionMatrix
from adt_str_tpu.evaluation.metrics import (
    aggregate_metrics,
    compute_metrics,
    compute_per_label_metrics,
    new_per_label_accumulator,
)
from adt_str_tpu.ops.matching import hopcroft_karp, match_notes
from adt_str_tpu.utils.mappings import ADTOF_LABEL_MAPPING


def notes(rows):
    return np.array(rows, dtype=np.float32).reshape(-1, 4)


def test_hopcroft_karp_max_matching():
    # left 0 -> {0}, left 1 -> {0, 1}: greedy could block, HK finds 2
    adj = [[0], [0, 1]]
    m = hopcroft_karp(adj, 2)
    assert len(m) == 2
    assert m[0] == 0 and m[1] == 1


def test_match_notes_onset_window():
    ref = notes([[1.0, 1.1, 38, 100]])
    est_in = notes([[1.04, 1.14, 38, 100]])
    est_out = notes([[1.06, 1.16, 38, 100]])
    assert len(match_notes(ref[:, :2], ref[:, 2] * 1000, est_in[:, :2], est_in[:, 2] * 1000,
                           onset_tolerance=0.05, pitch_tolerance=1.0)) == 1
    assert len(match_notes(ref[:, :2], ref[:, 2] * 1000, est_out[:, :2], est_out[:, 2] * 1000,
                           onset_tolerance=0.05, pitch_tolerance=1.0)) == 0


def test_match_notes_pitch_exactness():
    ref = notes([[1.0, 1.1, 38, 100]])
    est = notes([[1.0, 1.1, 35, 100]])
    assert len(match_notes(ref[:, :2], ref[:, 2] * 1000, est[:, :2], est[:, 2] * 1000,
                           onset_tolerance=0.05, pitch_tolerance=1.0)) == 0


def test_match_notes_maximum_cardinality():
    """Two refs at 1.00 and 1.04; two ests at 0.96 and 1.02. Greedy closest-
    first could match ref0-est1 and strand ref1; max matching pairs both."""
    ref = notes([[1.00, 1.1, 38, 100], [1.04, 1.14, 38, 100]])
    est = notes([[0.96, 1.06, 38, 100], [1.02, 1.12, 38, 100]])
    m = match_notes(ref[:, :2], ref[:, 2] * 1000, est[:, :2], est[:, 2] * 1000,
                    onset_tolerance=0.05, pitch_tolerance=1.0)
    assert len(m) == 2


def test_compute_metrics_edge_cases():
    assert compute_metrics([], []) == (0, 0, 0)
    assert compute_metrics([], notes([[0, 0.1, 38, 100]])) == (0, 0, 1)
    assert compute_metrics([], notes([[0, 0.1, 38, 100]]), exclude_ref_empty=True) == (0, 0, 0)
    assert compute_metrics(notes([[0, 0.1, 38, 100]]), []) == (0, 1, 0)


def test_compute_metrics_counts():
    ref = notes([[1.0, 1.1, 38, 100], [2.0, 2.1, 35, 100]])
    est = notes([[1.01, 1.11, 38, 100], [5.0, 5.1, 42, 100]])
    tp, fn, fp = compute_metrics(ref, est)
    assert (tp, fn, fp) == (1, 1, 1)


def test_per_label_metrics():
    ref = notes([[1.0, 1.1, 38, 100], [2.0, 2.1, 35, 100]])
    est = notes([[1.0, 1.1, 38, 100], [2.0, 2.1, 42, 100]])
    acc = new_per_label_accumulator()
    acc = compute_per_label_metrics(est, ref, acc)
    assert acc["SD"]["tp"] == 1
    assert acc["BD"]["fn"] == 1
    assert acc["HH"]["fp"] == 1
    assert "Other" not in acc


def test_aggregate_metrics():
    m = aggregate_metrics(6, 2, 2)
    assert m["precision"] == 0.75 and m["recall"] == 0.75
    np.testing.assert_allclose(m["f_measure"], 0.75)
    z = aggregate_metrics(0, 0, 0)
    assert z == {"precision": 0.0, "recall": 0.0, "f_measure": 0.0}


def test_confusion_matrix_two_pass():
    cm = DrumConfusionMatrix(ADTOF_LABEL_MAPPING)
    ref = notes([[1.0, 1.1, 38, 100], [2.0, 2.1, 35, 100]])
    # pred: exact SD match; BD misclassified as HH at matching onset; stray FP
    pred = notes([[1.01, 1.11, 38, 100], [2.0, 2.1, 42, 100], [7.0, 7.1, 48, 100]])
    cm.update(ref, pred)
    m = cm.get_matrix()
    assert m.loc["SD", "SD"] == 1
    assert m.loc["BD", "HH"] == 1  # cross-pitch confusion (pass 2)
    assert m.loc["False Positive", "CY + RD"] == 1


def test_confusion_matrix_exact_priority():
    """Pass 1 must claim the exact-pitch pred even when a wrong-pitch pred is
    closer in time."""
    cm = DrumConfusionMatrix(ADTOF_LABEL_MAPPING)
    ref = notes([[1.0, 1.1, 38, 100]])
    pred = notes([[1.001, 1.1, 42, 100], [1.04, 1.14, 38, 100]])
    cm.update(ref, pred)
    m = cm.get_matrix()
    assert m.loc["SD", "SD"] == 1
    assert m.loc["False Positive", "HH"] == 1


def test_confusion_csv(tmp_path):
    cm = DrumConfusionMatrix(ADTOF_LABEL_MAPPING)
    cm.update(notes([[1.0, 1.1, 38, 100]]), notes([[1.0, 1.1, 38, 100]]))
    path = str(tmp_path / "cm.csv")
    cm.to_csv(path)
    import pandas as pd

    df = pd.read_csv(path, index_col=0)
    assert "precision" in df.columns and "support" in df.columns
    assert df.loc["SD", "f1"] == 1.0
