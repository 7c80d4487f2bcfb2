"""Near-dup clustering: transitivity, singletons, determinism, keeper."""

import pytest
from pyspark.sql import functions as F

from dlkp_spark.pipeline.cluster import cluster_stats, dedup_clusters, keep_canonical


def _labels(spark, n_docs, edges, **kw):
    docs = spark.createDataFrame([(i,) for i in range(n_docs)], "doc_id long")
    pairs = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    if not edges:
        pairs = pairs.filter(F.lit(False))
    out = dedup_clusters(docs, pairs, **kw)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_chain_is_transitively_clustered(spark):
    # 0-1, 1-2, 2-3 chain: all collapse to min id 0 even though (0,3)
    # never appears as a pair
    got = _labels(spark, 6, [(0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5}


def test_singletons_map_to_self(spark):
    got = _labels(spark, 4, [])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_two_components(spark):
    got = _labels(spark, 7, [(5, 6), (1, 3), (3, 2)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_long_chain_converges_and_bound_raises(spark):
    edges = [(i, i + 1) for i in range(12)]
    got = _labels(spark, 13, edges)
    assert set(got.values()) == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        _labels(spark, 13, edges, max_rounds=2)


def test_keep_canonical_and_stats(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(5)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 4), (2, 4)], "a long, b long")
    labels = dedup_clusters(docs, pairs)
    kept = sorted(r["doc_id"] for r in keep_canonical(docs, labels).collect())
    assert kept == [0, 1, 3]  # 4 and 2 fold into cluster 1
    s = cluster_stats(labels).collect()[0]
    assert (s["n_docs"], s["n_clusters"], s["n_dup_docs"], s["max_cluster"]) \
        == (5, 3, 2, 3)
