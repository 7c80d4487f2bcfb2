"""Metric semantics vs hand-computed values from the reference formulas
(metrics.py:79-132), plus pure-Python ↔ DataFrame agreement."""

import pytest

from dlkp_spark.metrics import (
    compute_f1s,
    compute_kp_level_metrics,
    f1_at_k,
    kp_metrics_df,
    rank_identity_report,
)


def test_f1_at_k_basic():
    m = f1_at_k([1, 0, 1, 0, 0], n_gold=4, k=5)
    assert m["P@5"] == pytest.approx(0.4)
    assert m["R@5"] == pytest.approx(0.5)
    assert m["F1@5"] == pytest.approx(2 * 0.4 * 0.5 / 0.9)


def test_f1_at_m_uses_prediction_count():
    m = f1_at_k([1, 1], n_gold=4, k="m")
    assert m["P@m"] == 1.0 and m["R@m"] == 0.5


def test_empty_cases():
    assert f1_at_k([], 0, "m") == {"P@m": 0.0, "R@m": 0.0, "F1@m": 0.0}
    assert compute_kp_level_metrics([], []) == {}


def test_compute_f1s_dedup_and_case():
    m = compute_f1s(["Deep Learning", "deep learning", "bert"], ["DEEP LEARNING"])
    # deduped to 2 predictions; 1 hit
    assert m["P@m"] == pytest.approx(0.5)
    assert m["R@m"] == pytest.approx(1.0)


def test_corpus_average():
    preds = [["a", "b"], ["c"]]
    golds = [["a"], ["x"]]
    m = compute_kp_level_metrics(preds, golds)
    # ex1: P@m=0.5 R@m=1 F1=2/3 ; ex2: all 0
    assert m["P@m"] == pytest.approx(0.25)
    assert m["F1@m"] == pytest.approx(1 / 3)


def test_df_metrics_match_pure_python(spark):
    preds = [["a", "b", "c"], ["x"], ["q", "r"]]
    golds = [["a", "c", "z"], ["x"], ["zz"]]
    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(preds)], "doc_id long, keyphrases array<string>")
    gdf = spark.createDataFrame(
        [(i, g) for i, g in enumerate(golds)], "doc_id long, keyphrases array<string>")
    row = kp_metrics_df(pdf, gdf).collect()[0].asDict()
    want = compute_kp_level_metrics(preds, golds)
    for k, v in want.items():
        assert row[k] == pytest.approx(v), k


def test_rank_identity_report():
    a = [(1, 5, 1.5), (2, 3, 1.0)]
    assert rank_identity_report(a, list(a)) == {
        "rank_identical": True, "scores_bit_identical": True, "n_got": 2, "n_want": 2}
    b = [(1, 5, 1.5), (2, 4, 1.0)]
    assert not rank_identity_report(a, b)["rank_identical"]
