"""Evaluation metrics pinned against the EXECUTING reference.

``/root/reference/codes/core/evaluation/accuracy.py`` is pure numpy and runs
byte-identical with no shim at all.  ``mvfnet_tpu/utils/metrics.py``
re-implements it vectorized; this module asserts the two agree exactly —
including the tie-breaking of ``np.argsort`` inside top-k, non-contiguous
label vocabularies in the confusion matrix, and absent classes in
mean-class accuracy.
"""

import importlib.util

import numpy as np
import pytest

from mvfnet_tpu.utils import metrics as ours

REF_ACCURACY = '/root/reference/codes/core/evaluation/accuracy.py'


@pytest.fixture(scope='module')
def ref():
    spec = importlib.util.spec_from_file_location('ref_accuracy',
                                                  REF_ACCURACY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestSoftmax:

    def test_random(self, ref):
        x = np.random.RandomState(0).randn(17, 23) * 5
        np.testing.assert_array_equal(ours.softmax(x), ref.softmax(x))

    def test_extreme_logits_stable(self, ref):
        x = np.array([[1e4, 0.0, -1e4], [3.0, 3.0, 3.0]])
        np.testing.assert_array_equal(ours.softmax(x), ref.softmax(x))


class TestTopK:

    def test_random_scores(self, ref):
        rng = np.random.RandomState(1)
        scores = [rng.randn(400) for _ in range(64)]
        labels = [int(v) for v in rng.randint(0, 400, size=64)]
        ks = (1, 3, 5)
        np.testing.assert_array_equal(
            ours.top_k_accuracy(scores, labels, k=ks),
            ref.top_k_accuracy(scores, labels, k=ks))

    def test_tied_scores_break_identically(self, ref):
        # Heavily quantized scores force ties at the top-k boundary; both
        # sides must resolve them through the same argsort ordering.
        rng = np.random.RandomState(2)
        scores = [rng.randint(0, 4, size=20).astype(float)
                  for _ in range(50)]
        labels = [int(v) for v in rng.randint(0, 20, size=50)]
        ks = (1, 2, 5, 10)
        np.testing.assert_array_equal(
            ours.top_k_accuracy(scores, labels, k=ks),
            ref.top_k_accuracy(scores, labels, k=ks))


class TestConfusionMatrix:

    def test_non_contiguous_label_vocabulary(self, ref):
        # Labels with gaps (7, 100, 400...) exercise the union-label_map
        # remapping (reference accuracy.py:38-45).
        rng = np.random.RandomState(3)
        vocab = np.array([7, 100, 400, 401, 999], dtype=np.int64)
        y_pred = vocab[rng.randint(0, 5, size=200)]
        y_real = vocab[rng.randint(0, 5, size=200)]
        np.testing.assert_array_equal(ours.confusion_matrix(y_pred, y_real),
                                      ref.confusion_matrix(y_pred, y_real))

    def test_label_only_in_pred(self, ref):
        y_pred = np.array([0, 1, 2, 2], dtype=np.int64)
        y_real = np.array([0, 1, 1, 1], dtype=np.int64)
        np.testing.assert_array_equal(ours.confusion_matrix(y_pred, y_real),
                                      ref.confusion_matrix(y_pred, y_real))


class TestMeanClassAccuracy:

    def test_random(self, ref):
        rng = np.random.RandomState(4)
        scores = [rng.randn(30) for _ in range(120)]
        labels = [int(v) for v in rng.randint(0, 30, size=120)]
        assert ours.mean_class_accuracy(scores, labels) == \
            ref.mean_class_accuracy(scores, labels)

    def test_class_predicted_but_never_real(self, ref):
        # A class that appears only as a prediction yields a zero-count row
        # (cnt==0 -> 0.0 contribution) on both sides.
        scores = [np.array([0.0, 1.0, 0.0]),   # predicts 1
                  np.array([0.0, 0.0, 1.0]),   # predicts 2
                  np.array([1.0, 0.0, 0.0])]   # predicts 0
        labels = [1, 1, 0]                     # class 2 never real
        assert ours.mean_class_accuracy(scores, labels) == \
            ref.mean_class_accuracy(scores, labels)


class TestWeightedScore:

    def test_random_fusion(self, ref):
        rng = np.random.RandomState(5)
        score_list = [[rng.randn(10) for _ in range(8)] for _ in range(3)]
        coeff = [1.0, 0.5, 1.5]
        got = ours.get_weighted_score(score_list, coeff)
        want = ref.get_weighted_score(score_list, coeff)
        assert len(got) == len(want) == 8
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=0, atol=1e-12)
