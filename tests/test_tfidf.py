"""TF-IDF keyword extraction: python parity + ranking determinism."""

import math

from dlkp_spark.pipeline.textstats import tfidf_keywords

DOCS = [
    (0, "apple apple banana cherry"),
    (1, "banana banana banana date"),
    (2, "cherry date elderberry elderberry elderberry"),
    (3, "apple banana cherry date"),   # everything common -> low scores
    (4, ""),                           # no terms -> absent
]


def _py_tfidf(docs, k):
    tf, dfc = {}, {}
    for doc_id, text in docs:
        counts = {}
        for t in text.lower().split():
            counts[t] = counts.get(t, 0) + 1
        tf[doc_id] = counts
        for t in counts:
            dfc[t] = dfc.get(t, 0) + 1
    n = len(docs)
    out = {}
    for doc_id, counts in tf.items():
        scored = sorted(
            ((-c * (math.log((n + 1.0) / (dfc[t] + 1.0)) + 1.0), t)
             for t, c in counts.items()))
        out[doc_id] = [(r + 1, t, round(-s, 6))
                       for r, (s, t) in enumerate(scored[:k])]
    return out


def test_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = tfidf_keywords(df, k=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    for d in got:
        got[d].sort()
    exp = {d: v for d, v in _py_tfidf(DOCS, 3).items() if v}
    assert got == exp
    assert 4 not in got  # empty doc emits nothing


def test_rare_term_outranks_common(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = {r["doc_id"]: r["term"]
           for r in tfidf_keywords(df, k=1).collect()}
    # doc 2: elderberry (tf=3, df=1) must beat cherry/date (df>=3)
    assert top[2] == "elderberry"


def test_tie_breaks_by_term_asc(spark):
    df = spark.createDataFrame([(0, "zeta alpha")], "doc_id long, text string")
    rows = sorted((r["rank"], r["term"])
                  for r in tfidf_keywords(df, k=2).collect())
    assert rows == [(1, "alpha"), (2, "zeta")]


def test_df_branch_reuses_cached_tf(spark):
    from dlkp_spark.cache import release_cached
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    try:
        plan = tfidf_keywords(df, k=3)._jdf.queryExecution() \
            .executedPlan().toString()
        # without the persist Catalyst re-derives the df branch from the
        # source (two Generate/explode passes over the corpus)
        assert "InMemoryTableScan" in plan
    finally:
        release_cached()
