"""Attribute (facet) postings + metadata-filtered top-k.

The filter contract: candidates restricted (IN within an attribute, AND
across attributes), statistics untouched — surviving docs score
bit-identically to the unfiltered path. Pinned here against brute-force
filtering of the unfiltered batch scores, plus kernel-level checks for the
rebuilt block-max metadata on the BMW fallback path.
"""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.index.build import build_index, load_attrs
from dlkp_spark.query.wand import (_apply_doc_filter, _taat_topk,
                                   batch_topk, bmw_topk_lists)

QUERIES = [(0, ["w001", "w002"]), (1, ["w010"]), (2, ["w003", "w020", "w030"])]


def _corpus(spark, n=600, vocab=40):
    import random
    rng = random.Random(7)
    rows = []
    for i in range(n):
        toks = [f"w{rng.randint(0, vocab):03d}" for _ in range(rng.randint(20, 60))]
        rows.append((i, toks, [], ["en", "de", "fr"][i % 3], f"s{i % 5}"))
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, keyphrases array<string>, "
              "lang string, site string")


@pytest.fixture(scope="module")
def attr_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fltidx")) + "/idx"
    docs = _corpus(spark)
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=128, block_size=32,
                                n_term_partitions=8),
                n_shards=2, resume=False, n_docs=600, attrs=("lang", "site"))
    meta = {r["doc_id"]: (r["lang"], r["site"])
            for r in docs.select("doc_id", "lang", "site").collect()}
    full = batch_topk(spark, d, QUERIES, BM25Params(), k=1000).collect()
    scores = {(r.query_id, r.doc_id): r.score for r in full}
    return d, meta, scores


def _brute(meta, scores, filters, k=5):
    def allow(did):
        lang, site = meta[did]
        got = {"lang": lang, "site": site}
        return all(got[a] in vals for a, vals in filters.items())

    out = {}
    for (q, did), s in scores.items():
        if allow(did):
            out.setdefault(q, []).append((-s, did))
    return {q: [(did, -ns) for ns, did in sorted(lst)[:k]]
            for q, lst in out.items()}


@pytest.mark.parametrize("filters", [
    {"lang": ["en"]},
    {"lang": ["en", "de"]},                      # OR within an attribute
    {"lang": ["en"], "site": ["s0", "s1"]},      # AND across attributes
    {"site": ["s4"]},
])
def test_filtered_matches_brute_force_with_bit_equal_scores(
        spark, attr_index, filters):
    d, meta, scores = attr_index
    got = batch_topk(spark, d, QUERIES, BM25Params(), k=5,
                     filters=filters).collect()
    gm = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        gm.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert gm == _brute(meta, scores, filters)


def test_filtered_two_wave_bit_identical(spark, attr_index):
    d, _, _ = attr_index
    filters = {"lang": ["en"], "site": ["s0", "s1", "s2"]}
    one = batch_topk(spark, d, QUERIES, BM25Params(), k=5,
                     filters=filters).collect()
    two = batch_topk(spark, d, QUERIES, BM25Params(), k=5,
                     filters=filters, two_wave=True).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, one), key=lambda t: t[:2]) == \
           sorted(map(tuple, two), key=lambda t: t[:2])
    assert sorted(one, key=key) == sorted(two, key=key)


def test_filtered_composes_with_conjunctive(spark, attr_index):
    d, meta, scores = attr_index
    got = batch_topk(spark, d, [(0, ["w001", "w002"])], BM25Params(), k=5,
                     filters={"lang": ["en"]}, conjunctive=True).collect()
    # brute: docs matching BOTH terms (present in the unfiltered scores of
    # each single-term query) and lang=en
    s1 = batch_topk(spark, d, [(0, ["w001"])], BM25Params(), k=1000).collect()
    s2 = batch_topk(spark, d, [(0, ["w002"])], BM25Params(), k=1000).collect()
    both = {r.doc_id for r in s1} & {r.doc_id for r in s2}
    want = sorted(
        ((-scores[(0, did)], did) for did in both if meta[did][0] == "en"))[:5]
    assert [(r.doc_id, r.score) for r in sorted(got, key=lambda r: r.rank)] \
        == [(did, -ns) for ns, did in want]


def test_filter_value_matching_nothing_is_empty(spark, attr_index):
    d, _, _ = attr_index
    assert batch_topk(spark, d, QUERIES, BM25Params(), k=5,
                      filters={"lang": ["zz"]}).count() == 0


def test_filters_require_attr_built_index(spark, attr_index, tmp_path):
    d, _, _ = attr_index
    with pytest.raises(ValueError, match="no attribute postings"):
        batch_topk(spark, d, QUERIES, BM25Params(), k=5,
                   filters={"nope": ["x"]})
    plain = str(tmp_path / "plainidx")
    build_index(spark, _corpus(spark, n=100), plain,
                cfg=IndexConfig(segment_docs=64, n_term_partitions=4),
                n_shards=1, resume=False, n_docs=100)
    with pytest.raises(ValueError, match="no attribute postings"):
        batch_topk(spark, plain, QUERIES, BM25Params(), k=5,
                   filters={"lang": ["en"]})


def test_attr_sidecar_layout_and_resume(spark, tmp_path):
    d = str(tmp_path / "idx")
    docs = _corpus(spark, n=300)
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=128, n_term_partitions=4),
                n_shards=2, resume=False, n_docs=300, attrs=("lang",))
    rows = load_attrs(spark, d).collect()
    # every (value, segment) doc count adds up to the corpus
    assert sum(r["n_docs"] for r in rows) == 300
    assert {r["attr"] for r in rows} == {"lang"}
    assert {r["value"] for r in rows} == {"en", "de", "fr"}
    # a resume with the attrs dir present skips the sidecar pass but a
    # missing dir (kill before its commit) gets rebuilt
    before = sorted((r["value"], r["segment"], bytes(r["docs_vb"])) for r in rows)
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=128, n_term_partitions=4),
                n_shards=2, resume=True, n_docs=300, attrs=("lang",))
    shutil.rmtree(d + "/attrs")
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=128, n_term_partitions=4),
                n_shards=2, resume=True, n_docs=300, attrs=("lang",))
    after = sorted((r["value"], r["segment"], bytes(r["docs_vb"]))
                   for r in load_attrs(spark, d).collect())
    assert after == before


def test_apply_doc_filter_rebuilds_admissible_block_max():
    """BMW over filtered lists must stay exact: block metadata is rebuilt
    from surviving contributions, so pruning can't drop a true top-k doc."""
    rng = np.random.default_rng(3)
    for _ in range(25):
        n = int(rng.integers(10, 200))
        docs = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
        contribs = rng.random(n) * 3.0
        bs = 16
        nb = (n + bs - 1) // bs
        pad = nb * bs - n
        bmax = np.pad(contribs, (0, pad)).reshape(nb, bs).max(axis=1)
        blast = docs[np.minimum(np.arange(1, nb + 1) * bs - 1, n - 1)]
        lst = {"term": "t", "field": 0, "boost": 1.0, "docs": docs,
               "contribs": contribs, "block_max": bmax,
               "block_last": blast.astype(np.int64)}
        allowed = np.sort(rng.choice(10_000, size=4000, replace=False)).astype(np.int64)
        filtered = _apply_doc_filter([dict(lst)], allowed, bs)
        if not filtered:
            assert not np.isin(docs, allowed).any()
            continue
        f = filtered[0]
        keep = np.isin(docs, allowed)
        assert np.array_equal(f["docs"], docs[keep])
        assert np.array_equal(f["contribs"], contribs[keep])
        got = bmw_topk_lists([dict(f)], k=5, block_size=bs)
        want = _taat_topk([dict(f)], k=5)
        assert got == want


def test_compaction_carries_attr_postings(spark, tmp_path):
    """Filtered search must survive compaction: attr doc lists re-key to
    the merged segments and tombstoned ids are purged."""
    from dlkp_spark.index import snapshots as sn

    docs = _corpus(spark, n=400)
    t = str(tmp_path / "atbl")
    sn.commit_build(spark, docs, t,
                    cfg=IndexConfig(segment_docs=64, n_term_partitions=4),
                    n_shards=1, n_docs=400, attrs=("lang", "site"))
    filters = {"lang": ["en"], "site": ["s0", "s1", "s2"]}
    before = sn.snapshot_topk(spark, t, QUERIES, BM25Params(), k=2000,
                              filters=filters).collect()
    sn.commit_delete(spark, t, range(200, 400))
    sn.commit_compact(spark, t, factor=2,
                      cfg=IndexConfig(segment_docs=64, n_term_partitions=4),
                      n_shards=1)
    after = sn.snapshot_topk(spark, t, QUERIES, BM25Params(), k=2000,
                             filters=filters).collect()
    # same candidates minus tombstones; scores differ (stats recomputed on
    # purge), so compare the doc sets per query
    want = {}
    for r in before:
        if r.doc_id < 200:
            want.setdefault(r.query_id, set()).add(r.doc_id)
    got = {}
    for r in after:
        assert r.doc_id < 200
        got.setdefault(r.query_id, set()).add(r.doc_id)
    assert got == want
    # attr doc counts in the carried sidecar account exactly for survivors
    rows = load_attrs(spark, sn.index_dir_of(t)).collect()
    lang_total = sum(r["n_docs"] for r in rows if r["attr"] == "lang")
    assert lang_total == 200


def test_facet_counts_match_brute_force(spark, attr_index):
    from dlkp_spark.query.wand import facet_counts

    d, meta, scores = attr_index
    toks = None  # matched set == docs with any query term == scored docs
    for attr, col in (("lang", 0), ("site", 1)):
        got = {(r.query_id, r.value): r.n_docs
               for r in facet_counts(spark, d, QUERIES, attr).collect()}
        want: dict = {}
        for (q, did) in scores:
            v = meta[did][col]
            want[(q, v)] = want.get((q, v), 0) + 1
        assert got == want, attr
    # boost syntax is stripped for matching ("term^2" matches like "term")
    a = facet_counts(spark, d, [(0, ["w001^2", "w002"])], "lang").collect()
    b = facet_counts(spark, d, [(0, ["w001", "w002"])], "lang").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError, match="no attribute postings"):
        facet_counts(spark, d, QUERIES, "nope")
