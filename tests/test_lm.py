"""Bigram-LM perplexity scoring: brute-force parity + model contracts."""

import math

import pytest
from pyspark.sql import functions as F

from dlkp_spark.pipeline.lm import (bigram_pairs, collect_lm, lm_nats,
                                    train_bigram_lm)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "dogs bark loudly at the cat"),
    (3, "completely novel words appear here"),
    (4, "solo"),          # no bigrams → absent from the score table
    (5, ""),
]


def _py_lm(docs):
    uni, bi, vocab = {}, {}, set()
    for _, text in docs:
        toks = [t for t in text.lower().split() if t]
        vocab.update(toks)
        for v, w in zip(toks, toks[1:]):
            uni[v] = uni.get(v, 0) + 1
            bi[(v, w)] = bi.get((v, w), 0) + 1
    return uni, bi, len(vocab)


def _py_nats(text, uni, bi, vv, alpha=1.0):
    toks = [t for t in text.lower().split() if t]
    acc = 0.0
    for v, w in zip(toks, toks[1:]):
        acc = acc + math.log(
            (bi.get((v, w), 0) + alpha) / (uni.get(v, 0) + alpha * vv))
    return round(-acc / (len(toks) - 1), 6)


def test_train_matches_python_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    uni, bi, vocab = train_bigram_lm(df)
    u, b = collect_lm(uni, bi)
    pu, pb, pv = _py_lm(DOCS)
    assert u == pu and b == pb and vocab == pv


def test_lm_nats_matches_python_fold(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    uni, bi, vocab = train_bigram_lm(df)
    u, b = collect_lm(uni, bi)
    got = {r["doc_id"]: (r["n_bigrams"], r["nats_per_token"])
           for r in lm_nats(spark, df, u, b, vocab).collect()}
    pu, pb, pv = _py_lm(DOCS)
    for doc_id, text in DOCS:
        toks = [t for t in text.lower().split() if t]
        if len(toks) < 2:
            assert doc_id not in got
        else:
            assert got[doc_id] == (len(toks) - 1, _py_nats(text, pu, pb, pv))
    # unseen-bigram doc scores strictly worse than an in-distribution one
    assert got[3][1] > got[0][1]


def test_min_count_prunes_pairs_not_contexts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    uni, bi, _ = train_bigram_lm(df, min_count=2)
    u, b = collect_lm(uni, bi)
    pu, pb, _ = _py_lm(DOCS)
    assert b == {k: c for k, c in pb.items() if c >= 2}
    assert u == pu  # context counts keep the full mass


def test_collect_lm_bounded():
    # r6 interface: the bound rides on limit(max_entries+1).collect(),
    # so the driver never holds more than max_entries+1 rows per table
    class FakeDF:
        def __init__(self, n):
            self.n = n
            self.limited = None

        def limit(self, m):
            self.limited = m
            return self

        def collect(self):
            return [None] * min(self.n, self.limited)

    with pytest.raises(ValueError, match="max_entries"):
        collect_lm(FakeDF(3), FakeDF(5), max_entries=7)
    # the limit must actually be applied (bounded driver memory even when
    # the aggregate side is huge)
    big = FakeDF(10**9)
    with pytest.raises(ValueError, match="max_entries"):
        collect_lm(big, FakeDF(0), max_entries=7)
    assert big.limited == 8


def test_bigram_pairs_scan_local_until_agg(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bigram_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "pair construction must not shuffle"
