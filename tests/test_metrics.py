"""Metric tests: golden values, naive-oracle comparisons, edge semantics.

Modeled on reference qmf/test/MetricsTest.cpp (value tables) and
MetricsManagerTest.cpp (name registry), plus randomized comparisons against a
direct Python transcription of the reference loops (including the tie rule:
equal scores rank positives first).
"""

import numpy as np
import pytest

from qmf_tpu.metrics import (
    AUC,
    AveragePrecision,
    MeanSquaredError,
    MetricsEngine,
    MetricsManager,
    Precision,
    Recall,
    parse_at_k_metric,
)
from qmf_tpu.config import MetricsConfig


# --- naive oracles: direct transcription of reference Metrics.cpp loops ----
def _ranked(labels, scores):
    pairs = sorted(
        zip(scores, [bool(l > 0) for l in labels]),
        key=lambda p: (-p[0], -int(p[1])),
    )
    return [b for _, b in pairs]


def naive_auc(labels, scores):
    pos = sum(1 for l in labels if l > 0)
    neg = len(labels) - pos
    if pos == 0 or neg == 0:
        return 1.0
    tp, auc = 0, 0.0
    for b in _ranked(labels, scores):
        if b:
            tp += 1
        else:
            auc += tp / pos / neg
    return auc


def naive_ap(labels, scores):
    total_pos = sum(1 for l in labels if l > 0)
    ap, pos = 0.0, 0
    for i, b in enumerate(_ranked(labels, scores), 1):
        if b:
            pos += 1
            ap += pos / i
    return ap / total_pos


def naive_p_at_k(labels, scores, k):
    return sum(_ranked(labels, scores)[:k]) / k


def naive_r_at_k(labels, scores, k):
    total_pos = sum(1 for l in labels if l > 0)
    return sum(_ranked(labels, scores)[:k]) / total_pos


class TestMetricValues:
    def test_mse(self):
        labels = [[1.0, 2.0, 3.0]]
        scores = [[1.0, 1.0, 5.0]]
        assert MeanSquaredError().compute(labels, scores) == pytest.approx(
            (0 + 1 + 4) / 3
        )

    def test_auc_simple(self):
        # perfect ranking -> 1.0; inverted -> 0.0
        labels = [[1.0, 1.0, 0.0, 0.0]]
        assert AUC().compute(labels, [[4.0, 3.0, 2.0, 1.0]]) == pytest.approx(1.0)
        assert AUC().compute(labels, [[1.0, 2.0, 3.0, 4.0]]) == pytest.approx(0.0)
        assert AUC().compute(labels, [[3.0, 1.0, 2.0, 0.5]]) == pytest.approx(0.75)

    def test_auc_tie_favors_positive(self):
        # reference comparator puts positives first on equal scores
        labels = [[1.0, 0.0]]
        scores = [[2.0, 2.0]]
        assert AUC().compute(labels, scores) == pytest.approx(1.0)

    def test_auc_empty_class_returns_one(self):
        assert AUC().compute([[1.0, 1.0]], [[0.5, 0.2]]) == pytest.approx(1.0)
        assert AUC().compute([[0.0, 0.0]], [[0.5, 0.2]]) == pytest.approx(1.0)

    def test_precision_recall_at_k(self):
        labels = [[1.0, 0.0, 1.0, 0.0, 0.0]]
        scores = [[5.0, 4.0, 3.0, 2.0, 1.0]]
        assert Precision(2).compute(labels, scores) == pytest.approx(0.5)
        assert Precision(3).compute(labels, scores) == pytest.approx(2 / 3)
        assert Recall(2).compute(labels, scores) == pytest.approx(0.5)
        assert Recall(3).compute(labels, scores) == pytest.approx(1.0)

    def test_ap(self):
        labels = [[1.0, 0.0, 1.0, 0.0]]
        scores = [[4.0, 3.0, 2.0, 1.0]]
        # positives at ranks 1 and 3: (1/1 + 2/3) / 2
        assert AveragePrecision().compute(labels, scores) == pytest.approx(
            (1.0 + 2 / 3) / 2
        )

    def test_p_at_k_requires_k_elements(self):
        with pytest.raises(ValueError):
            Precision(5).compute([[1.0, 0.0]], [[1.0, 2.0]])

    def test_r_at_k_requires_positive(self):
        with pytest.raises(ValueError):
            Recall(1).compute([[0.0, 0.0]], [[1.0, 2.0]])

    def test_ap_requires_positive(self):
        with pytest.raises(ValueError):
            AveragePrecision().compute([[0.0, 0.0]], [[1.0, 2.0]])

    def test_multi_user_average(self):
        labels = [[1.0, 0.0], [0.0, 1.0]]
        scores = [[2.0, 1.0], [2.0, 1.0]]
        # user0 auc=1, user1 auc=0 -> mean 0.5
        assert AUC().compute(labels, scores) == pytest.approx(0.5)


class TestAgainstNaiveOracle:
    @pytest.mark.parametrize("trial", range(5))
    def test_randomized(self, trial):
        rng = np.random.default_rng(trial)
        n_users, n_items = 7, 30
        labels = (rng.random((n_users, n_items)) < 0.3).astype(float) * rng.integers(
            1, 5, (n_users, n_items)
        )
        # guarantee both classes per user
        labels[:, 0] = 1.0
        labels[:, 1] = 0.0
        # duplicate scores to exercise tie handling
        scores = np.round(rng.normal(size=(n_users, n_items)), 1)

        def mean(fn, *args):
            return float(
                np.mean([fn(labels[i], scores[i], *args) for i in range(n_users)])
            )

        assert AUC().compute(labels, scores) == pytest.approx(
            mean(naive_auc), abs=1e-6
        )
        assert AveragePrecision().compute(labels, scores) == pytest.approx(
            mean(naive_ap), abs=1e-6
        )
        for k in (1, 5, 10):
            assert Precision(k).compute(labels, scores) == pytest.approx(
                mean(naive_p_at_k, k), abs=1e-6
            )
            assert Recall(k).compute(labels, scores) == pytest.approx(
                mean(naive_r_at_k, k), abs=1e-6
            )


class TestMetricsManager:
    def test_parse_at_k(self):
        assert parse_at_k_metric("p@10") == ("p", 10)
        assert parse_at_k_metric("r@5") == ("r", 5)
        assert parse_at_k_metric("@5") is None
        assert parse_at_k_metric("p") is None
        assert parse_at_k_metric("p@x") is None

    def test_registry(self):
        m = MetricsManager.get()
        for name in ("mse", "auc", "ap", "p@10", "r@3"):
            assert m.exists(name)
            assert m.get_metric(name) is not None
        assert not m.exists("bogus")
        assert not m.exists("q@5")
        assert m.get_metric("bogus") is None

    def test_lazy_at_k_instances(self):
        m = MetricsManager.get()
        p = m.get_metric("p@7")
        assert isinstance(p, Precision) and p.k == 7


class TestMetricsEngine:
    def test_add_and_record(self):
        me = MetricsEngine(MetricsConfig(num_test_users=2, always_compute=True))
        assert me.add_test_avg_metric("auc")
        assert me.add_test_avg_metric("p@1")
        assert not me.add_test_avg_metric("nope")
        labels = [[1.0, 0.0], [0.0, 1.0]]
        scores = [[2.0, 1.0], [1.0, 2.0]]
        me.compute_and_record_test_avg_metrics(3, labels, scores)
        assert me.last("test_avg_auc") == (3, pytest.approx(1.0))
        assert me.last("test_avg_p@1") == (3, pytest.approx(1.0))
        me.compute_and_record_test_avg_metrics(4, labels, scores)
        assert len(me.metrics_map["test_avg_auc"]) == 2

    def test_missing_metric_raises(self):
        me = MetricsEngine()
        me.test_avg_metrics.append("ghost@x")
        with pytest.raises(KeyError):
            me.compute_and_record_test_avg_metrics(1, [[1.0, 0.0]], [[1.0, 0.0]])


class TestPlainMetrics:
    def test_flat_vector_inputs(self):
        # reference plain (non-averaged) compute over flat vectors
        me = MetricsEngine()
        assert me.add_train_metric("mse")
        assert me.add_test_metric("auc")
        me.compute_and_record_train_metrics(1, [1.0, 2.0], [1.0, 4.0])
        assert me.last("train_mse") == (1, pytest.approx(2.0))
        me.compute_and_record_test_metrics(1, [1.0, 0.0], [3.0, 1.0])
        assert me.last("test_auc") == (1, pytest.approx(1.0))
