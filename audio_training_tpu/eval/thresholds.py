"""Per-class decision-threshold search + pre/species model combination
(preeval.py capability parity)."""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)


def best_thresholds(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    labels: list[str],
    clip_min: float = 0.5,
    clip_max: float = 0.9,
) -> dict[str, float]:
    """Best F-score threshold per class from the PR curve
    (preeval.best_threshold, preeval.py:396-471), clipped to [0.5, 0.9]
    (preeval.py:212-221)."""
    from sklearn.metrics import precision_recall_curve

    out: dict[str, float] = {}
    for i, label in enumerate(labels):
        yt = y_true[:, i]
        if yt.sum() == 0:
            out[label] = clip_max
            continue
        precision, recall, thresholds = precision_recall_curve(yt, y_pred[:, i])
        with np.errstate(divide="ignore", invalid="ignore"):
            f = np.nan_to_num(
                2 * precision * recall / (precision + recall)
            )
        ix = int(np.argmax(f[:-1])) if len(f) > 1 else 0
        thresh = float(thresholds[min(ix, len(thresholds) - 1)])
        out[label] = float(np.clip(thresh, clip_min, clip_max))
    return out


def combine_pre_model(
    species_pred: np.ndarray,
    species_labels: list[str],
    pre_pred: np.ndarray,
    pre_labels: list[str],
    pre_thresh: float = 0.7,
) -> np.ndarray:
    """Gate species predictions with a bird/human/noise "pre model"
    (preeval.main, preeval.py:39-140): when the pre model is confident the
    clip is noise or human, species probabilities are suppressed."""
    out = species_pred.copy()
    for gate in ("noise", "human"):
        if gate not in pre_labels:
            continue
        gi = pre_labels.index(gate)
        confident = pre_pred[:, gi] >= pre_thresh
        keep = [
            i for i, l in enumerate(species_labels) if l in ("noise", "human")
        ]
        mask = np.ones(len(species_labels), bool)
        mask[keep] = False
        out[confident] = np.where(mask, 0.0, out[confident])
    return out


def apply_thresholds(
    y_pred: np.ndarray, labels: list[str], thresholds: dict[str, float],
    default: float = 0.7,
) -> np.ndarray:
    """Binary decisions using per-class thresholds."""
    t = np.array([thresholds.get(l, default) for l in labels], y_pred.dtype)
    return (y_pred >= t).astype(np.float32)
