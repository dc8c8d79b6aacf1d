"""Metric oracles: confusion matrix, balanced accuracy."""

import numpy as np

from pointcloudlib_tpu.train.metrics import balanced_accuracy, fast_confusion


def test_fast_confusion():
    true = np.array([0, 0, 1, 2, 2, 2])
    pred = np.array([0, 1, 1, 2, 2, 0])
    cm = fast_confusion(true, pred, 3)
    want = np.array([[1, 1, 0], [0, 1, 0], [1, 0, 2]])
    np.testing.assert_array_equal(cm, want)


def test_balanced_accuracy():
    true = np.array([0, 0, 0, 0, 1])
    pred = np.array([0, 0, 0, 0, 0])
    # class 0 recall 1.0, class 1 recall 0.0 → balanced 0.5;
    # plain accuracy would be 0.8
    assert balanced_accuracy(true, pred, 2) == 0.5


def test_balanced_accuracy_ignores_absent_classes():
    true = np.array([0, 0])
    pred = np.array([0, 0])
    assert balanced_accuracy(true, pred, 5) == 1.0
