"""Decontamination + domain-mix sampling: brute-force parity and scale-shape.

The n-gram semantics are pinned against a pure-Python sliding window; the
domain-mix fractions against hand-computed targets; the plan against the
broadcast the 100-TB shape requires (the corpus side must not shuffle
before the gram join).
"""

import pytest
from pyspark.sql import functions as F

from dlkp_spark.pipeline.decontam import (decontaminate, ngram_contamination,
                                          word_ngrams)
from dlkp_spark.pipeline.sampling import (domain_mix_sample, mix_fractions,
                                          stratified_sample)


def py_ngrams(text: str, n: int) -> set[str]:
    toks = [t for t in text.split() if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown fox leaps over a sleeping dog"),
    (2, "entirely different words with no overlap at all"),
    (3, "the quick brown fox jumps again and again today"),
    (4, "short doc"),
    (5, ""),
]
EVAL = [
    (100, "someone saw the quick brown fox jumps over a fence"),
    (101, "benchmarks contain entirely different words with no overlap"),
]


@pytest.mark.parametrize("n", [2, 3, 5])
def test_word_ngrams_matches_python(spark, n):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: set(r["g"]) for r in
           df.select("doc_id", word_ngrams(F.col("text"), n).alias("g")).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_ngrams(text, n), (doc_id, n)


def test_ngram_contamination_matches_bruteforce(spark):
    n = 3
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    got = {r["doc_id"]: r["shared_ngrams"] for r in
           ngram_contamination(docs, ev, n=n).collect()}
    eval_grams = set().union(*(py_ngrams(t, n) for _, t in EVAL))
    want = {d: len(py_ngrams(t, n) & eval_grams) for d, t in DOCS
            if py_ngrams(t, n) & eval_grams}
    assert got == want
    assert want, "fixture must produce a non-empty contaminated set"


def test_decontaminate_drops_exactly_the_flagged(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    flagged = {r["doc_id"] for r in ngram_contamination(docs, ev, n=3).collect()}
    kept = {r["doc_id"] for r in decontaminate(docs, ev, n=3).collect()}
    assert kept == {d for d, _ in DOCS} - flagged
    # schema preserved
    assert decontaminate(docs, ev, n=3).columns == docs.columns


def test_contamination_plan_broadcasts_eval_not_corpus(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    plan = ngram_contamination(docs, ev, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval grams ship, corpus stays put
    assert "SortMergeJoin" not in plan


def test_mix_fractions_math_and_cap():
    fr = mix_fractions({"a": 100, "b": 50, "c": 10},
                       {"a": 1.0, "b": 1.0, "c": 2.0}, total=80.0)
    assert fr["a"] == (1.0 / 4.0) * 80.0 / 100  # 0.2
    assert fr["b"] == (1.0 / 4.0) * 80.0 / 50   # 0.4
    assert fr["c"] == 1.0                        # capped: wants 40, has 10
    assert "d" not in fr


def test_domain_mix_sample_is_stratified_with_derived_fracs(spark):
    rows = [(i, f"src{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"src0": 3.0, "src1": 1.0}
    got = sorted(r["doc_id"] for r in
                 domain_mix_sample(df, weights, total=60.0).collect())
    fr = mix_fractions({"src0": 100, "src1": 100}, weights, 60.0)
    want = sorted(r["doc_id"] for r in stratified_sample(
        df.filter(F.col("source").isin(["src0", "src1"])), fr).collect())
    assert got == want
    assert got, "sample must be non-empty"
    # unweighted sources contribute nothing
    srcs = {r["source"] for r in
            domain_mix_sample(df, weights, total=60.0).collect()}
    assert srcs <= {"src0", "src1"}


def test_domain_mix_nested_under_growing_total(spark):
    rows = [(i, f"src{i % 2}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"src0": 1.0, "src1": 1.0}
    small = {r["doc_id"] for r in
             domain_mix_sample(df, weights, total=40.0).collect()}
    big = {r["doc_id"] for r in
           domain_mix_sample(df, weights, total=120.0).collect()}
    assert small <= big and len(small) < len(big)
