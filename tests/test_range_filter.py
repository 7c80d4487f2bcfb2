"""Numeric/lexicographic range filters over attribute postings.

Pinned here:
- range_filters equals explicit filters= with the hand-expanded value
  list (bit-identical rows incl. scores);
- numeric bounds compare numerically (value "10" is inside (9, 11)
  where lexicographic compare would exclude it), string bounds compare
  lexicographically;
- an out-of-domain range returns no rows; same-attr overlap with
  filters raises; unknown attr raises.
"""

import pytest
from pyspark.sql import functions as F

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, prepare_docs
from dlkp_spark.oracle import reference_query_set
from dlkp_spark.query.wand import batch_topk

N_DOCS = 200
K = 8
CFG = IndexConfig(segment_docs=64, block_size=16, n_term_partitions=8)
P = BM25Params()
QUERIES = reference_query_set(n_queries=10)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = prepare_docs(generate_web_pages(spark, N_DOCS, seed=17))
    return docs.withColumn(
        "bucket", F.floor(F.size("tokens") / F.lit(10)).cast("string")).persist()


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rng_idx"))
    build_index(spark, corpus, d, cfg=CFG, n_shards=2, attrs=("bucket",))
    return d


@pytest.fixture(scope="module")
def buckets(corpus):
    return sorted({r["bucket"] for r in corpus.select("bucket").collect()},
                  key=float)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_range_equals_expanded_filters(spark, index_dir, buckets):
    lo, hi = float(buckets[0]), float(buckets[len(buckets) // 2])
    got = batch_topk(spark, index_dir, QUERIES, P, k=K,
                     range_filters={"bucket": (lo, hi)})
    vals = [b for b in buckets if lo <= float(b) <= hi]
    want = batch_topk(spark, index_dir, QUERIES, P, k=K,
                      filters={"bucket": vals})
    assert _rows(got) and _rows(got) == _rows(want)


def test_numeric_compare_beats_lexicographic(spark, index_dir, buckets):
    if not any(float(b) >= 10 for b in buckets):
        pytest.skip("corpus has no two-digit bucket")
    # numeric (9, 11) includes "10"; lexicographic "09".."11" ordering
    # of raw strings would not ("10" > "9" lexicographically is False)
    got = batch_topk(spark, index_dir, QUERIES, P, k=K,
                     range_filters={"bucket": (9, 11)})
    vals = [b for b in buckets if 9 <= float(b) <= 11]
    assert "10" in vals
    want = batch_topk(spark, index_dir, QUERIES, P, k=K,
                      filters={"bucket": vals})
    assert _rows(got) == _rows(want)


def test_string_bounds_lexicographic(spark, index_dir, buckets):
    lo, hi = min(buckets), max(buckets)  # string min/max
    got = batch_topk(spark, index_dir, QUERIES, P, k=K,
                     range_filters={"bucket": (lo, hi)})
    vals = [b for b in buckets if lo <= b <= hi]
    want = batch_topk(spark, index_dir, QUERIES, P, k=K,
                      filters={"bucket": vals})
    assert _rows(got) == _rows(want)


def test_empty_range_empty_result(spark, index_dir):
    out = batch_topk(spark, index_dir, QUERIES, P, k=K,
                     range_filters={"bucket": (1e9, 2e9)})
    assert out.count() == 0


def test_overlap_with_filters_raises(spark, index_dir):
    with pytest.raises(ValueError, match="one form per attribute"):
        batch_topk(spark, index_dir, QUERIES, P, k=K,
                   filters={"bucket": ["3"]},
                   range_filters={"bucket": (1, 2)})


def test_unknown_attr_raises(spark, index_dir):
    with pytest.raises(ValueError, match="no attribute postings"):
        batch_topk(spark, index_dir, QUERIES, P, k=K,
                   range_filters={"nope": (1, 2)})


def test_facet_stats_match_value_counts(spark, index_dir):
    from dlkp_spark.query.wand import facet_counts, facet_stats

    got = {int(r["query_id"]):
           (int(r["n_docs"]), r["vmin"], r["vmax"], r["vsum"], r["vavg"])
           for r in facet_stats(spark, index_dir, QUERIES,
                                "bucket").collect()}
    fc = facet_counts(spark, index_dir, QUERIES, "bucket").collect()
    per_q: dict[int, list] = {}
    for r in fc:
        per_q.setdefault(int(r["query_id"]), []).append(
            (float(r["value"]), int(r["n_docs"])))
    assert set(got) == set(per_q) and got
    for q, pairs in per_q.items():
        n = sum(c for _, c in pairs)
        vsum = sum(v * c for v, c in pairs)
        want = (n, min(v for v, _ in pairs), max(v for v, _ in pairs),
                vsum, round(vsum / n, 6))
        assert got[q] == pytest.approx(want), q


def test_facet_ranges_match_value_counts(spark, index_dir):
    from dlkp_spark.query.wand import facet_counts, facet_ranges

    fc = facet_counts(spark, index_dir, QUERIES, "bucket").collect()
    vals = sorted({float(r["value"]) for r in fc})
    mid = vals[len(vals) // 2]
    # bucket 0 and 1 overlap at [mid, mid+1) — contains the real value
    # mid, so the double-count is exercised; 2 is upper-open
    ranges = [(None, mid + 1), (mid, None), (vals[0], None)]
    got = {(int(r["query_id"]), int(r["bucket"])): int(r["n_docs"])
           for r in facet_ranges(spark, index_dir, QUERIES, "bucket",
                                 ranges).collect()}
    want: dict[tuple[int, int], int] = {}
    for r in fc:
        v = float(r["value"])
        for i, (lo, hi) in enumerate(ranges):
            if (lo is None or v >= lo) and (hi is None or v < hi):
                key = (int(r["query_id"]), i)
                want[key] = want.get(key, 0) + int(r["n_docs"])
    assert got == want and got
    # overlap double-counts: mid's docs appear in BOTH bucket 0 and 1
    q_mid = {int(r["query_id"]) for r in fc if float(r["value"]) == mid}
    assert any((q, 0) in got and (q, 1) in got for q in q_mid)
