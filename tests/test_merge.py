"""LSM segment merge: query results identical pre/post compaction."""

import pytest
from pyspark.sql import functions as F

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, load_postings, prepare_docs
from dlkp_spark.index.merge import merge_segments
from dlkp_spark.oracle import reference_query_set
from dlkp_spark.query.wand import batch_topk

CFG = IndexConfig(segment_docs=32, block_size=8, n_term_partitions=4)


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    src = str(base / "idx")
    docs = prepare_docs(generate_web_pages(spark, 200, seed=42))
    build_index(spark, docs, src, cfg=CFG, n_shards=2)
    out = str(base / "merged")
    merge_segments(spark, src, out, factor=2, cfg=CFG)
    return src, out


def test_merge_halves_segments(spark, dirs):
    src, out = dirs
    n_src = load_postings(spark, src).select("segment").distinct().count()
    n_out = load_postings(spark, out).select("segment").distinct().count()
    assert n_out == (n_src + 1) // 2
    # postings conserved
    s = load_postings(spark, src).agg(F.sum("n_postings")).collect()[0][0]
    o = load_postings(spark, out).agg(F.sum("n_postings")).collect()[0][0]
    assert s == o


def test_merge_preserves_query_results(spark, dirs):
    src, out = dirs
    queries = reference_query_set(n_queries=10)
    a = batch_topk(spark, src, queries, BM25Params(), k=10).collect()
    b = batch_topk(spark, out, queries, BM25Params(), k=10).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([tuple(r) for r in a], key=lambda t: (t[0], t[1])) == \
           sorted([tuple(r) for r in b], key=lambda t: (t[0], t[1]))


def test_merge_with_different_block_size_queries_correctly(spark, dirs):
    """ADVICE regression: merging with a cfg whose block_size differs from
    the source build must write the NEW block_size into stats.json, or
    wand_topk indexes block_max/block_last with the wrong stride."""
    import os

    from dlkp_spark.index.build import load_stats
    from dlkp_spark.query.wand import wand_topk

    src, _ = dirs
    out = os.path.join(os.path.dirname(src), "merged_bs")
    cfg2 = IndexConfig(segment_docs=CFG.segment_docs, block_size=32,
                       n_term_partitions=4)  # source built with block_size=8
    merge_segments(spark, src, out, factor=2, cfg=cfg2)
    assert load_stats(out)["block_size"] == 32
    queries = reference_query_set(n_queries=5)
    a = wand_topk(spark, src, queries, BM25Params(), k=10).collect()
    b = wand_topk(spark, out, queries, BM25Params(), k=10).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, a), key=lambda t: t[:2]) == \
           sorted(map(tuple, b), key=lambda t: t[:2])


def test_merge_default_cfg_inherits_source_block_size(spark, dirs):
    import os

    from dlkp_spark.index.build import load_stats

    src, _ = dirs
    out = os.path.join(os.path.dirname(src), "merged_default")
    merge_segments(spark, src, out, factor=2)  # no cfg given
    assert load_stats(out)["block_size"] == CFG.block_size


def test_merge_killed_before_commit_leaves_source_intact_and_reruns(spark, dirs):
    """Kill window between the staging write and the per-shard commit
    loop: the source index must be untouched and stale staged bytes must
    not poison a rerun — it overwrites the stale staging dir and produces
    the identical merged index."""
    import os

    src, out = dirs
    want = sorted(map(tuple, load_postings(spark, out)
                      .select("term", "field", "segment", "docs_vb").collect()))
    out3 = os.path.join(os.path.dirname(out), "merged_kill")
    # simulate the crash: a prior attempt staged data but never committed
    # any shard (staging lives under out_dir/_tmp/merge since round 5)
    stale = os.path.join(out3, "_tmp", "merge", "shard=0")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "garbage.parquet"), "wb") as f:
        f.write(b"not parquet")     # poison: must be wiped, not merged in
    assert not os.path.isdir(os.path.join(out3, "segments")), \
        "no shard visible before any commit"
    src_before = sorted(map(tuple, load_postings(spark, src)
                            .select("term", "field", "segment").collect()))
    merge_segments(spark, src, out3, factor=2, cfg=CFG)
    got = sorted(map(tuple, load_postings(spark, out3)
                     .select("term", "field", "segment", "docs_vb").collect()))
    assert got == want, "rerun after kill produced a different index"
    src_after = sorted(map(tuple, load_postings(spark, src)
                           .select("term", "field", "segment").collect()))
    assert src_after == src_before, "merge touched the source index"


def test_merge_kill_mid_commit_resumes_only_uncommitted_shards(spark, dirs):
    """Round-5 item #4: a merge killed AFTER some shard commits resumes
    shard-grained — the rerun skips committed shards, re-encodes exactly
    the missing ones, and the result is byte-identical to an uninterrupted
    merge."""
    import os
    import shutil

    from dlkp_spark.index import manifest as mf

    src, out = dirs
    want = sorted(map(tuple, load_postings(spark, out)
                      .select("term", "field", "segment", "docs_vb",
                              "tfs_vb", "dls_vb").collect()))
    out4 = os.path.join(os.path.dirname(out), "merged_resume")
    m1 = merge_segments(spark, src, out4, factor=2, cfg=CFG)
    n_shards = len(m1["shards"])
    assert n_shards > 1, "need >1 shard for a meaningful resume test"
    # simulate a kill between shard commits: one committed shard survives,
    # another's manifest + data are gone
    victim = 1
    os.remove(mf.shard_manifest_path(out4, victim))
    shutil.rmtree(os.path.join(out4, "segments", f"shard={victim}"))
    m2 = merge_segments(spark, src, out4, factor=2, cfg=CFG)
    skipped = {s["shard"] for s in m2["shards"] if s.get("skipped")}
    assert skipped == set(range(n_shards)) - {victim}
    got = sorted(map(tuple, load_postings(spark, out4)
                     .select("term", "field", "segment", "docs_vb",
                             "tfs_vb", "dls_vb").collect()))
    assert got == want, "resumed merge diverged from uninterrupted merge"
    assert m2["posting_rows"] == m1["posting_rows"]


def test_merge_resume_ignores_other_merge_config(spark, dirs):
    """A shard committed by a DIFFERENT merge (other factor/source) into
    the same dir must not be skipped — the merge config-hash covers the
    lineage descriptor."""
    import os

    from dlkp_spark.index import manifest as mf

    src, out = dirs
    out5 = os.path.join(os.path.dirname(out), "merged_cfgmix")
    merge_segments(spark, src, out5, factor=2, cfg=CFG)
    m = mf.read_shard_manifest(out5, 0)
    assert m["status"] == "committed"
    # rerunning with a different factor re-encodes everything (no skips)
    m2 = merge_segments(spark, src, out5, factor=3, cfg=CFG)
    assert not any(s.get("skipped") for s in m2["shards"])


def test_merge_is_atomic_on_rerun(spark, dirs):
    src, out = dirs
    # merging again over the merged index into a new dir works and halves again
    import os
    out2 = os.path.join(os.path.dirname(out), "merged2")
    m = merge_segments(spark, out, out2, factor=2, cfg=CFG)
    assert m["posting_rows"] > 0
