"""Per-term query boosts ("term^w"): kernel identity + path agreement."""

import random

import numpy as np
import pytest

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.index.build import build_index
from dlkp_spark.query.bm25 import exact_topk
from dlkp_spark.query.wand import (_parse_boosts, _taat_topk, _weight_list,
                                   batch_topk, bmw_topk_lists)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = random.Random(11)
    rows = []
    for i in range(500):
        toks = [f"w{rng.randint(0, 30):03d}" for _ in range(rng.randint(20, 50))]
        rows.append((i, toks, []))
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, keyphrases array<string>")
    d = str(tmp_path_factory.mktemp("boost")) + "/idx"
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=128, block_size=32,
                                n_term_partitions=8),
                n_shards=1, resume=False, n_docs=500)
    return d, docs


def test_parse_boosts():
    clean, w = _parse_boosts([(0, ["a^2.5", "b", "c^1.0"]), (1, ["a"])])
    assert clean == [(0, ["a", "b", "c"]), (1, ["a"])]
    assert w == {(0, "a"): 2.5}
    with pytest.raises(ValueError, match="boost must be > 0"):
        _parse_boosts([(0, ["a^0"])])
    with pytest.raises(ValueError, match="boost must be > 0"):
        _parse_boosts([(0, ["a^-2"])])
    # conflicting weights for one deduped term must raise, not last-win
    with pytest.raises(ValueError, match="conflicting boosts"):
        _parse_boosts([(0, ["a^2", "a^3"])])
    with pytest.raises(ValueError, match="conflicting boosts"):
        _parse_boosts([(0, ["a^2", "a"])])
    # exact repeats stay allowed (dedup makes them one clause anyway)
    clean2, w2 = _parse_boosts([(0, ["a^2", "a^2", "b", "b"])])
    assert w2 == {(0, "a"): 2.0}


def test_boosts_reorder_and_weight_one_is_identity(spark, built):
    d, _ = built
    base = batch_topk(spark, d, [(0, ["w001", "w002"])], BM25Params(),
                      k=20).collect()
    one = batch_topk(spark, d, [(0, ["w001^1.0", "w002"])], BM25Params(),
                     k=20).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, one))
    heavy = batch_topk(spark, d, [(0, ["w001^8", "w002^0.125"])], BM25Params(),
                       k=20).collect()
    assert [r.doc_id for r in sorted(heavy, key=lambda r: r.rank)] != \
           [r.doc_id for r in sorted(base, key=lambda r: r.rank)]


def test_index_path_matches_dataframe_weight_column(spark, built):
    d, docs = built
    terms = [(0, "w001", 3.0), (0, "w002", 1.0), (1, "w010", 0.5),
             (1, "w011", 2.0)]
    qdf = spark.createDataFrame(terms, "query_id long, term string, weight double")
    df_path = exact_topk(docs, qdf, BM25Params(), k=10).collect()
    queries = [(0, ["w001^3.0", "w002"]), (1, ["w010^0.5", "w011^2.0"])]
    idx_path = batch_topk(spark, d, queries, BM25Params(), k=10).collect()
    a = sorted([(r.query_id, r.rank, r.doc_id) for r in df_path])
    b = sorted([(r.query_id, r.rank, r.doc_id) for r in idx_path])
    assert a == b
    sa = {(r.query_id, r.doc_id): r.score for r in df_path}
    for r in idx_path:
        assert sa[(r.query_id, r.doc_id)] == pytest.approx(r.score, rel=1e-12)


def test_boosted_two_wave_bit_identical(spark, built):
    d, _ = built
    queries = [(0, ["w001^4", "w002"]), (1, ["w010^0.2", "w011"])]
    one = batch_topk(spark, d, queries, BM25Params(), k=10).collect()
    two = batch_topk(spark, d, queries, BM25Params(), k=10,
                     two_wave=True).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))


def test_weighted_kernels_bit_identical():
    """Weighted dense TAAT == weighted BMW: _weight_list fixes the
    grouping (boost × contrib) × w and rebuilds admissible bounds."""
    rng = np.random.default_rng(7)
    for _ in range(40):
        lists = []
        for t in ("a", "b", "c"):
            n = int(rng.integers(5, 60))
            docs = np.sort(rng.choice(500, size=n, replace=False)).astype(np.int64)
            contribs = rng.random(n) * 2.0
            bs = 8
            nb = (n + bs - 1) // bs
            pad = nb * bs - n
            bmax = np.pad(contribs, (0, pad)).reshape(nb, bs).max(axis=1)
            blast = docs[np.minimum(np.arange(1, nb + 1) * bs - 1, n - 1)]
            lists.append({"term": t, "field": 0, "boost": 1.0, "docs": docs,
                          "contribs": contribs, "block_max": bmax,
                          "block_last": blast.astype(np.int64)})
        w = float(rng.choice([0.25, 0.5, 2.0, 5.0]))
        weighted = [_weight_list(lst, w) if lst["term"] == "b" else lst
                    for lst in lists]
        got = bmw_topk_lists([dict(x) for x in weighted], k=7, block_size=8)
        want = _taat_topk([dict(x) for x in weighted], k=7)
        assert got == want
