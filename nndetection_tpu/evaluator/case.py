"""Patient-level (case) evaluation
(``/root/reference/nndet/evaluator/case.py:202-240``): reduce each case's
detections to the max box score per class and score patient classification
(AUROC / AP) against a target class derived from the GT.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from sklearn.metrics import average_precision_score, roc_auc_score


class CaseEvaluator:
    def __init__(self, classes: Sequence[str], target_class: Optional[int] = None):
        self.classes = list(classes)
        self.target_class = target_class
        self.case_scores: List[np.ndarray] = []
        self.case_targets: List[int] = []

    def add_case(
        self,
        pred_scores: np.ndarray,
        pred_labels: np.ndarray,
        gt_classes: np.ndarray,
    ) -> None:
        scores = np.zeros(len(self.classes))
        for c in range(len(self.classes)):
            m = np.asarray(pred_labels) == c
            if m.any():
                scores[c] = float(np.max(np.asarray(pred_scores)[m]))
        self.case_scores.append(scores)
        if self.target_class is not None:
            target = int(self.target_class in np.asarray(gt_classes))
        else:
            target = int(len(np.asarray(gt_classes)) > 0)
        self.case_targets.append(target)

    def finish_online_evaluation(self) -> Dict[str, float]:
        if not self.case_scores:
            return {}
        scores = np.stack(self.case_scores)
        targets = np.asarray(self.case_targets)
        if self.target_class is not None:
            s = scores[:, self.target_class]
        else:
            s = scores.max(axis=1)
        out: Dict[str, float] = {}
        if len(np.unique(targets)) > 1:
            out["case_auroc"] = float(roc_auc_score(targets, s))
            out["case_ap"] = float(average_precision_score(targets, s))
        else:
            out["case_auroc"] = float("nan")
            out["case_ap"] = float("nan")
        self.case_scores, self.case_targets = [], []
        return out
