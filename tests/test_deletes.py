"""Tombstone deletes: snapshot commit, query-time masking, compaction purge.

Delete semantics (Lucene/Iceberg shape): a delete commit writes a
cumulative tombstone file and swaps HEAD — no data rewrite, pre-delete
snapshots stay readable. Queries mask tombstoned ids at decode time with
snapshot statistics; compaction PURGES: postings drop out and statistics
(n_docs, dl_sums/avgdl, per-(term, field) df → idf and block-max) are
recomputed exactly, pinned here as bit-identity with a from-scratch build
of the surviving corpus under the same doc ids.
"""

import random

import pytest
from pyspark.sql import functions as F

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.index import snapshots as sn
from dlkp_spark.index.build import build_index, load_postings, load_stats
from dlkp_spark.query.wand import batch_topk

QUERIES = [(0, ["w001", "w002"]), (1, ["w010", "w011"])]
CFG = IndexConfig(segment_docs=64, block_size=32, n_term_partitions=8)


def _corpus(spark, n=400):
    rng = random.Random(5)
    rows = []
    for i in range(n):
        toks = [f"w{rng.randint(0, 30):03d}" for _ in range(rng.randint(20, 50))]
        rows.append((i, toks, ["w000 w001"] if i % 7 == 0 else []))
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, keyphrases array<string>")


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    t = str(tmp_path_factory.mktemp("deltbl")) + "/tbl"
    docs = _corpus(spark)
    s1 = sn.commit_build(spark, docs, t, cfg=CFG, n_shards=2, n_docs=400)
    full = sn.snapshot_topk(spark, t, QUERIES, BM25Params(), k=2000).collect()
    full_scores = {(r.query_id, r.doc_id): r.score for r in full}
    s2 = sn.commit_delete(spark, t, range(250, 400))
    return t, docs, s1, s2, full_scores


def test_masking_is_exact_with_snapshot_stats(spark, table):
    t, _, _, _, full_scores = table
    after = sn.snapshot_topk(spark, t, QUERIES, BM25Params(), k=2000).collect()
    assert all(r.doc_id < 250 for r in after)
    got = {(r.query_id, r.doc_id): r.score for r in after}
    # stale-stats contract: surviving docs keep their pre-delete scores
    assert got == {kq: s for kq, s in full_scores.items() if kq[1] < 250}


def test_time_travel_sees_pre_delete_docs(spark, table):
    t, _, s1, _, _ = table
    tt = sn.snapshot_topk(spark, t, QUERIES, BM25Params(), k=2000,
                          as_of=s1["snapshot_id"]).collect()
    assert any(r.doc_id >= 250 for r in tt)


def test_deletes_are_cumulative_and_unknown_ids_are_noops(spark, table):
    t, _, _, _, _ = table
    s3 = sn.commit_delete(spark, t, [0, 1, 2, 999_999])
    assert s3["metrics"]["tombstones_total"] == 150 + 4
    after = sn.snapshot_topk(spark, t, QUERIES, BM25Params(), k=2000).collect()
    assert all(2 < r.doc_id < 250 for r in after)


def test_compaction_purges_bit_identical_to_fresh_build(spark, table, tmp_path):
    t, docs, _, _, _ = table
    sn.commit_compact(spark, t, factor=2, cfg=CFG, n_shards=2)
    head = sn.current_snapshot(t)
    assert head["operation"] == "compact" and "delete_rel" not in head
    purged = sn.snapshot_topk(spark, t, QUERIES, BM25Params(), k=2000).collect()

    surv = docs.filter((F.col("doc_id") > 2) & (F.col("doc_id") < 250))
    fresh_dir = str(tmp_path / "fresh")
    build_index(spark, surv, fresh_dir, cfg=CFG, n_shards=2, resume=False,
                n_docs=247)
    fresh = batch_topk(spark, fresh_dir, QUERIES, BM25Params(), k=2000).collect()
    assert sorted(map(tuple, purged)) == sorted(map(tuple, fresh))

    # statistics recomputed exactly: n_docs, dl_sums, avgdl, per-term df
    st_c, st_f = load_stats(sn.index_dir_of(t)), load_stats(fresh_dir)
    assert st_c["n_docs"] == st_f["n_docs"] == 247
    assert st_c["dl_sums"] == st_f["dl_sums"]
    assert st_c["avgdl"] == st_f["avgdl"]
    dfc = {(r.term, r.field): r.df for r in
           load_postings(spark, sn.index_dir_of(t))
           .select("term", "field", "df").distinct().collect()}
    dff = {(r.term, r.field): r.df for r in
           load_postings(spark, fresh_dir)
           .select("term", "field", "df").distinct().collect()}
    assert dfc == dff
    # no tombstoned doc id survives anywhere in the postings
    assert sn.snapshot_topk(spark, t, [(9, ["w000"])], BM25Params(),
                            k=5000).filter("doc_id >= 250 or doc_id <= 2"
                                           ).count() == 0


def test_expire_reclaims_unreferenced_delete_files(spark, table):
    t, _, _, _, _ = table
    import os
    kept = sn.expire_snapshots(t, keep_last=1)
    assert kept  # something expired
    del_dir = os.path.join(t, "deletes")
    live = {os.path.basename(s["delete_rel"]) for s in sn.history(t)
            if "delete_rel" in s}
    on_disk = set(os.listdir(del_dir)) if os.path.isdir(del_dir) else set()
    assert on_disk == live


def test_delete_requires_snapshot(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        sn.commit_delete(spark, str(tmp_path / "empty"), [1])


def test_positional_compaction_purge_preserves_phrases(spark, tmp_path):
    """Deletes ride through the positional merge: pos_vb runs of dropped
    docs are excised, and phrase results equal a fresh positional build."""
    from dlkp_spark.query.phrase import phrase_topk

    rng = random.Random(9)
    rows = []
    for i in range(200):
        toks = [f"w{rng.randint(0, 15):03d}" for _ in range(rng.randint(15, 30))]
        if i % 4 == 0:
            pos = rng.randint(0, len(toks) - 1)
            toks[pos:pos] = ["alpha", "beta"]
        rows.append((i, toks, []))
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, keyphrases array<string>")
    cfg = IndexConfig(segment_docs=32, block_size=16, n_term_partitions=4,
                      positions=True)
    t = str(tmp_path / "postbl")
    sn.commit_build(spark, docs, t, cfg=cfg, n_shards=1, n_docs=200)
    sn.commit_delete(spark, t, range(100, 200))
    sn.commit_compact(spark, t, factor=2, cfg=cfg, n_shards=1)

    fresh_dir = str(tmp_path / "posfresh")
    build_index(spark, docs.filter(F.col("doc_id") < 100), fresh_dir,
                cfg=cfg, n_shards=1, resume=False, n_docs=100)
    ph = [(0, ["alpha", "beta"])]
    got = phrase_topk(spark, sn.index_dir_of(t), ph, BM25Params(), k=100).collect()
    want = phrase_topk(spark, fresh_dir, ph, BM25Params(), k=100).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert got and all(r.doc_id < 100 for r in got)


def test_append_after_delete_carries_tombstones(spark, tmp_path):
    from dlkp_spark.corpus import generate_web_pages
    from dlkp_spark.index.build import prepare_docs

    t = str(tmp_path / "apptbl")
    pages = generate_web_pages(spark, 120, seed=3)
    docs = prepare_docs(pages, n_docs=120)
    cfg = IndexConfig(segment_docs=32, block_size=16, n_term_partitions=4)
    sn.commit_build(spark, docs, t, cfg=cfg, n_shards=1, n_docs=120)
    sn.commit_delete(spark, t, range(0, 60))
    snap = sn.commit_append(spark, generate_web_pages(spark, 30, seed=4),
                            t, cfg=cfg)
    assert snap.get("delete_rel"), "append dropped the tombstones"
    dels = sn.read_deletes(spark, t)
    assert dels.count() == 60


def test_docmap_url_delete_and_resolve(spark, tmp_path):
    from dlkp_spark.corpus import generate_web_pages
    from dlkp_spark.index.build import load_docmap, prepare_docs

    t = str(tmp_path / "urltbl")
    docs = prepare_docs(generate_web_pages(spark, 150, seed=6), n_docs=150)
    cfg = IndexConfig(segment_docs=64, n_term_partitions=4)
    snap = sn.commit_build(spark, docs, t, cfg=cfg, n_shards=1, n_docs=150)
    assert snap["lineage"]["docmap"] == ["url", "warc_ts", "lang"]
    dm = load_docmap(spark, sn.index_dir_of(t))
    assert dm.count() == 150 and dm.select("url").distinct().count() == 150

    hits = sn.snapshot_topk(spark, t, [(0, ["w0003", "w0007"])],
                            BM25Params(), k=5)
    res = sn.resolve_urls(spark, t, hits).collect()
    assert len(res) == 5 and all(r.url.startswith("https://site") for r in res)

    top = next(r for r in res if r.rank == 1)
    sn.commit_delete(spark, t, urls=[top.url])
    res2 = sn.snapshot_topk(spark, t, [(0, ["w0003", "w0007"])],
                            BM25Params(), k=5).collect()
    assert all(r.doc_id != top.doc_id for r in res2)
    # unknown url is a no-op; exactly-one-of arg contract enforced
    s3 = sn.commit_delete(spark, t, urls=["https://nowhere.example/x"])
    assert s3["metrics"]["tombstones_total"] == 1
    with pytest.raises(ValueError, match="exactly one"):
        sn.commit_delete(spark, t, doc_ids=[1], urls=["x"])
    with pytest.raises(ValueError, match="exactly one"):
        sn.commit_delete(spark, t)


def test_docmap_absent_without_url_column(spark, tmp_path):
    from dlkp_spark.index.build import load_docmap

    t = str(tmp_path / "nourl")
    sn.commit_build(spark, _corpus(spark, n=80), t, cfg=CFG, n_shards=1,
                    n_docs=80)
    with pytest.raises(FileNotFoundError, match="docmap"):
        load_docmap(spark, sn.index_dir_of(t))
    with pytest.raises(FileNotFoundError, match="docmap"):
        sn.commit_delete(spark, t, urls=["x"])


def test_phrase_and_prefix_respect_tombstones(spark, tmp_path):
    """A tombstoned doc must not surface from ANY query surface: phrase
    masking happens inside the segment kernel BEFORE per-segment top-k
    truncation, prefix routes through batch_topk's delete path."""
    from dlkp_spark.query.phrase import phrase_topk
    from dlkp_spark.query.wand import prefix_topk

    rng = random.Random(13)
    rows = []
    for i in range(160):
        toks = [f"w{rng.randint(0, 12):03d}" for _ in range(rng.randint(15, 25))]
        if i % 2 == 0:
            toks[3:3] = ["gamma", "delta"]
        rows.append((i, toks, []))
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, keyphrases array<string>")
    cfg = IndexConfig(segment_docs=32, block_size=16, n_term_partitions=4,
                      positions=True)
    t = str(tmp_path / "qsur")
    sn.commit_build(spark, docs, t, cfg=cfg, n_shards=1, n_docs=160)
    idx = sn.index_dir_of(t)

    before = phrase_topk(spark, idx, [(0, ["gamma", "delta"])],
                         BM25Params(), k=200).collect()
    assert any(r.doc_id < 80 for r in before)
    sn.commit_delete(spark, t, range(0, 80))

    ph = sn.snapshot_phrase_topk(spark, t, [(0, ["gamma", "delta"])],
                                 BM25Params(), k=200).collect()
    assert ph and all(r.doc_id >= 80 for r in ph)
    # masking is exact: survivors keep their pre-delete scores and fill
    # top-k slots freed by tombstoned docs
    want = sorted([(r.doc_id, r.score) for r in before if r.doc_id >= 80],
                  key=lambda x: (-x[1], x[0]))
    assert [(r.doc_id, r.score) for r in
            sorted(ph, key=lambda r: r.rank)] == want

    dels = sn.read_deletes(spark, t)
    pre = prefix_topk(spark, idx, [(0, "w00")], BM25Params(), k=200,
                      deletes=dels).collect()
    assert pre and all(r.doc_id >= 80 for r in pre)


def test_docmap_rides_compaction_and_appends(spark, tmp_path):
    """url addressing must survive the index lifecycle: compaction carries
    the doc map (minus tombstones), appends extend it per batch, and
    reconcile folds the union into the new version."""
    from dlkp_spark.corpus import generate_web_pages
    from dlkp_spark.index.build import prepare_docs
    from dlkp_spark.index.snapshots import _snapshot_docmap

    t = str(tmp_path / "lifecycle")
    docs = prepare_docs(generate_web_pages(spark, 120, seed=21), n_docs=120)
    cfg = IndexConfig(segment_docs=32, block_size=16, n_term_partitions=4)
    sn.commit_build(spark, docs, t, cfg=cfg, n_shards=1, n_docs=120)

    # delete 40 docs by id, compact: the carried map drops exactly those
    sn.commit_delete(spark, t, range(0, 40))
    sn.commit_compact(spark, t, factor=2, cfg=cfg, n_shards=1)
    dm = _snapshot_docmap(spark, t, sn.current_snapshot(t))
    assert dm.count() == 80 and dm.filter("doc_id < 40").count() == 0
    hits = sn.snapshot_topk(spark, t, [(0, ["w0004"])], BM25Params(), k=5)
    res = sn.resolve_urls(spark, t, hits).collect()
    assert res and all(r.url.startswith("https://site") for r in res)

    # append a batch: its doc map extends the snapshot's union
    snap = sn.commit_append(spark, generate_web_pages(spark, 30, seed=22),
                            t, cfg=cfg)
    dm2 = _snapshot_docmap(spark, t, snap)
    assert dm2.count() == 80 + 30
    appended_url = dm2.filter("doc_id >= 120").limit(1).collect()[0]["url"]

    # delete an APPENDED doc by url — resolvable only via the batch map
    s_del = sn.commit_delete(spark, t, urls=[appended_url])
    assert s_del["metrics"]["tombstones_total"] == 1

    # reconcile folds the union docmap into the fresh version dir
    sn.commit_reconcile(spark, t, cfg=cfg, n_shards=1)
    import os
    vdir = sn.index_dir_of(t)
    assert os.path.isdir(os.path.join(vdir, "docmap"))
    dm3 = _snapshot_docmap(spark, t, sn.current_snapshot(t))
    assert dm3.count() == 110
    hits3 = sn.snapshot_topk(spark, t, [(0, ["w0004"])], BM25Params(), k=5)
    assert sn.resolve_urls(spark, t, hits3).count() == 5
