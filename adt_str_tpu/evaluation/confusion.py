"""Drum confusion matrix (parity with `DrumConfusionMatrix`, eval.py:41-147).

Two-pass greedy matching within the onset tolerance window:
1. exact-pitch pairs, closest onset first;
2. remaining refs matched to any unmatched candidate by closest onset
   (cross-pitch -> confusion cell).
Unmatched refs -> "False Negative" column; unmatched preds -> "False Positive"
row (suppressed when `exclude_ref_empty` and the reference is empty). CSV
export appends per-label precision/recall/f1/support columns.
"""

from __future__ import annotations

import pandas as pd


class DrumConfusionMatrix:
    def __init__(self, label_mapping: dict[int, str], onset_tolerance: float = 0.05):
        base = list(label_mapping.values())
        if "Other" not in base:
            base.append("Other")
        self.labels = base
        self.mapping = label_mapping
        self.onset_tolerance = onset_tolerance
        rows = self.labels + ["False Positive"]
        cols = self.labels + ["False Negative"]
        self.matrix = pd.DataFrame(0, index=rows, columns=cols)

    def _label(self, pitch) -> str:
        return self.mapping.get(int(pitch), "Other")

    def update(self, ref_notes, pred_notes, exclude_ref_empty: bool = False) -> None:
        refs = [(i, float(r[0]), int(r[2])) for i, r in enumerate(ref_notes)]
        preds = [(j, float(p[0]), int(p[2])) for j, p in enumerate(pred_notes)]

        cand = {}
        for i, r_on, _ in refs:
            c = [
                (abs(p_on - r_on), j)
                for j, p_on, _ in preds
                if abs(p_on - r_on) <= self.onset_tolerance
            ]
            cand[i] = sorted(c)

        matched_ref: dict[int, int] = {}
        matched_pred: dict[int, int] = {}

        # pass 1: exact-pitch matches, globally closest first
        exact_edges = [
            (dt, i, j)
            for i, _, r_pi in refs
            for dt, j in cand[i]
            if preds[j][2] == r_pi
        ]
        exact_edges.sort(key=lambda x: x[0])
        for _, i, j in exact_edges:
            if i not in matched_ref and j not in matched_pred:
                matched_ref[i] = j
                matched_pred[j] = i

        # pass 2: remaining refs -> closest unmatched candidate (confusions)
        for i, _, _ in refs:
            if i in matched_ref:
                continue
            for _, j in cand[i]:
                if j not in matched_pred:
                    matched_ref[i] = j
                    matched_pred[j] = i
                    break

        for i, _, r_pi in refs:
            r_lbl = self._label(r_pi)
            if i in matched_ref:
                p_lbl = self._label(preds[matched_ref[i]][2])
                self.matrix.loc[r_lbl, p_lbl] += 1
            else:
                self.matrix.loc[r_lbl, "False Negative"] += 1

        skip_fp = exclude_ref_empty and len(refs) == 0
        for j, _, p_pi in preds:
            if j not in matched_pred and not skip_fp:
                self.matrix.loc["False Positive", self._label(p_pi)] += 1

    def _metrics_for_label(self, lbl: str):
        m, labels = self.matrix, self.labels
        tp = int(m.loc[lbl, lbl])
        fn = int(m.loc[lbl, "False Negative"] + m.loc[lbl, labels].sum() - tp)
        fp = int(m.loc["False Positive", lbl] + m.loc[labels, lbl].sum() - tp)
        prec = tp / (tp + fp) if (tp + fp) else 0.0
        rec = tp / (tp + fn) if (tp + fn) else 0.0
        f1 = (2 * prec * rec / (prec + rec)) if (prec + rec) else 0.0
        return prec, rec, f1, tp + fn

    def to_csv(self, path: str) -> None:
        df = self.matrix.copy()
        prec, rec, f1, sup = [], [], [], []
        for lbl in df.index:
            if lbl in self.labels:
                p, r, f, s = self._metrics_for_label(lbl)
                prec.append(p)
                rec.append(r)
                f1.append(f)
                sup.append(s)
            else:
                prec.append("")
                rec.append("")
                f1.append("")
                sup.append("")
        df["precision"] = prec
        df["recall"] = rec
        df["f1"] = f1
        df["support"] = sup
        df.to_csv(path, index=True)

    def get_matrix(self) -> pd.DataFrame:
        return self.matrix
