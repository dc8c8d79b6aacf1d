"""Evaluation metrics: shape IoU (ShapeNet part), confusion matrix."""

from __future__ import annotations

import numpy as np

# per-category part counts / offsets (reference train_partseg.py:24-25)
SEG_NUM = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
INDEX_START = [0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47]


def shape_ious(
    pred: np.ndarray,   # [B, N] predicted part ids
    seg: np.ndarray,    # [B, N] ground-truth part ids
    label: np.ndarray,  # [B] object category ids
) -> np.ndarray:
    """Per-shape mean part IoU (reference calculate_shape_IoU,
    train_partseg.py:28-63): IoU averaged over the shape's category part
    range; empty-union parts count as IoU 1."""
    out = np.empty(len(pred), np.float64)
    for i in range(len(pred)):
        c = int(label[i])
        start, num = INDEX_START[c], SEG_NUM[c]
        ious = []
        for part in range(start, start + num):
            inter = np.sum((pred[i] == part) & (seg[i] == part))
            union = np.sum((pred[i] == part) | (seg[i] == part))
            ious.append(1.0 if union == 0 else inter / union)
        out[i] = np.mean(ious)
    return out


def balanced_accuracy(
    true: np.ndarray, pred: np.ndarray, n_classes: int
) -> float:
    """Mean per-class recall (reference uses sklearn
    balanced_accuracy_score, train_partseg.py:142-144)."""
    cm = fast_confusion(true, pred, n_classes)
    per_class = np.diag(cm) / np.maximum(cm.sum(axis=1), 1)
    present = cm.sum(axis=1) > 0
    return float(per_class[present].mean()) if present.any() else 0.0


def fast_confusion(
    true: np.ndarray, pred: np.ndarray, n_classes: int
) -> np.ndarray:
    """Vectorized bincount confusion matrix (reference train_cls.py:143-227)."""
    idx = true.astype(np.int64) * n_classes + pred.astype(np.int64)
    return np.bincount(idx, minlength=n_classes * n_classes).reshape(
        n_classes, n_classes
    )
