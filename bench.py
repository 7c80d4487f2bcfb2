#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Measures the two north-star metrics plus headline contract queries:
  - index_build: SPIMI build (analyze → tag → encode → commit) over a
    deterministic generated web corpus  → docs/sec
  - wand_query: batch block-max WAND top-10 over the built index for the
    reference query set → queries/sec
  - headline driver-contract queries at $SPARK_GRAFT_SF_DIR

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_N_DOCS (default 20000) — generated corpus size for the build/query bench.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_N_DOCS", "20000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from dlkp_spark import contract
    from dlkp_spark.config import BM25Params, IndexConfig
    from dlkp_spark.corpus import generate_web_pages
    from dlkp_spark.index.build import build_index, prepare_docs
    from dlkp_spark.oracle import reference_query_set
    from dlkp_spark.query.wand import batch_topk, wand_topk
    from dlkp_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # corpus parquet is the engine INPUT (stand-in for the Iceberg table) —
    # generating it is not part of the measured build
    src_dir = tempfile.mkdtemp(prefix="bench_pages_") + "/pages"
    generate_web_pages(spark, n_docs, seed=42).write.parquet(src_dir)
    pages = spark.read.parquet(src_dir)

    # -- index build (analyze → tag → ids → encode → commit) ----------------
    # best-of-2 like every other number here: the shared host's CPU-steal
    # spikes can 2× a single-shot measurement (BASELINE.md), and the
    # round-2 artifact recorded exactly that artifact-vs-claim mismatch.
    # n_shards=2 matches the contract's WAND query layout; since round 3
    # all shards encode in ONE job, so shard count no longer multiplies
    # job barriers.
    cfg = IndexConfig(segment_docs=2048, block_size=64, n_term_partitions=cpus)
    idx_dir = None
    best = None
    for _ in range(2):
        from dlkp_spark.cache import release_cached
        d = tempfile.mkdtemp(prefix="bench_idx_")
        t0 = time.perf_counter()
        docs = prepare_docs(pages, validate=True, n_docs=n_docs)
        build_index(spark, docs, d, cfg=cfg, n_shards=2, resume=False,
                    n_docs=n_docs)
        dt = time.perf_counter() - t0
        release_cached()
        spark.catalog.clearCache()
        if best is None or dt < best:
            best = dt
            if idx_dir:
                shutil.rmtree(idx_dir, ignore_errors=True)
            idx_dir = d
        else:
            shutil.rmtree(d, ignore_errors=True)
    timings["index_build"] = best
    extra["index_build_docs_per_sec"] = n_docs / best

    # -- top-10 BM25 over the compressed index (best-of-2 each) -------------
    queries = reference_query_set(n_queries=200)
    big_queries = reference_query_set(n_queries=2000)

    def best_of(fn, n=3):
        # best-of-3 for the cheap query metrics (seconds each): a single
        # host-steal spike contaminated BOTH runs of a best-of-2 in one
        # recorded window (wand 24.9 s vs its 4–8 s isolation range)
        b = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            b = dt if b is None else min(b, dt)
            spark.catalog.clearCache()
        return b

    timings["bm25_batch_200q"] = best_of(
        lambda: batch_topk(spark, idx_dir, queries, BM25Params(), k=10).count())
    extra["bm25_queries_per_sec"] = len(queries) / timings["bm25_batch_200q"]
    timings["bm25_batch_2000q"] = best_of(
        lambda: batch_topk(spark, idx_dir, big_queries, BM25Params(), k=10).count())
    extra["bm25_batch_queries_per_sec"] = (
        len(big_queries) / timings["bm25_batch_2000q"])
    timings["wand_20q"] = best_of(
        lambda: wand_topk(spark, idx_dir, queries[:20], BM25Params(), k=10).count())
    extra["wand_queries_per_sec"] = 20 / timings["wand_20q"]

    # -- LSM compaction cycle: many small streamed segments → merge ---------
    # measures that compaction (a) runs at bench scale and (b) actually
    # buys query latency back on a fragmented index
    from dlkp_spark.index.merge import merge_segments

    frag_cfg = IndexConfig(segment_docs=256, block_size=64, n_term_partitions=cpus)
    frag_dir = tempfile.mkdtemp(prefix="bench_frag_")
    build_index(spark, prepare_docs(pages, validate=False, n_docs=n_docs),
                frag_dir, cfg=frag_cfg, n_shards=1, resume=False, n_docs=n_docs)
    spark.catalog.clearCache()
    pre = best_of(
        lambda: batch_topk(spark, frag_dir, queries, BM25Params(), k=10).count())
    # factor=2 (79 → 40 segments), NOT a deeper merge: batch_topk
    # parallelizes by segment, so compacting below ~#cores groups trades
    # decode overhead for lost parallelism (measured: 79→10 segments on
    # 32 cores made the after-query SLOWER in some windows). The scale
    # rule: compaction must keep #segments >> cluster parallelism.
    merged_dir = tempfile.mkdtemp(prefix="bench_merged_") + "/idx"
    t0 = time.perf_counter()
    merge_segments(spark, frag_dir, merged_dir, factor=2, cfg=frag_cfg)
    timings["compact_merge"] = time.perf_counter() - t0
    post = best_of(
        lambda: batch_topk(spark, merged_dir, queries, BM25Params(), k=10).count())
    extra["compact_query_sec_before"] = round(pre, 3)
    extra["compact_query_sec_after"] = round(post, 3)
    shutil.rmtree(frag_dir, ignore_errors=True)
    shutil.rmtree(os.path.dirname(merged_dir), ignore_errors=True)
    shutil.rmtree(idx_dir, ignore_errors=True)

    # -- two-wave segment pruning on a SELECTIVE query set ------------------
    # the 100×-scale path (round-5 item #1): a skewed corpus where each
    # query's top-k is decided inside one doc-range segment while the term
    # still appears (tf=1 noise) in EVERY segment — so the term-match join
    # prunes nothing and only the metadata upper-bound gate can skip work.
    from pyspark.sql import functions as F

    from dlkp_spark.query.wand import two_wave_pair_counts

    seg_docs = 256
    n_hot = min(50, n_docs // seg_docs)
    skew_rows = []
    for i in range(n_docs):
        seg = i // seg_docs
        toks = ["the"] * 6 + ["data", "query", "filler"]
        if seg < n_hot:
            toks += [f"hot{seg}"] * 8
        # tf 1-3 noise for EVERY hot term in EVERY doc: the term-match join
        # prunes nothing, only the metadata upper-bound gate can skip work
        for j in range(n_hot):
            toks += [f"hot{j}"] * (1 + (i * 7 + j) % 3)
        skew_rows.append((i, toks))
    skew_docs = (spark.createDataFrame(skew_rows, "doc_id long, tokens array<string>")
                 .withColumn("keyphrases", F.array().cast("array<string>")))
    skew_dir = tempfile.mkdtemp(prefix="bench_skew_") + "/idx"
    build_index(spark, skew_docs, skew_dir, cfg=frag_cfg, n_shards=1,
                resume=False, n_docs=n_docs)
    sel_queries = [(j, [f"hot{j}"]) for j in range(n_hot)]
    timings["bm25_selective_1wave"] = best_of(
        lambda: batch_topk(spark, skew_dir, sel_queries, BM25Params(), k=10).count())
    timings["bm25_selective_2wave"] = best_of(
        lambda: batch_topk(spark, skew_dir, sel_queries, BM25Params(), k=10,
                           two_wave=True).count())
    pc = two_wave_pair_counts(spark, skew_dir, sel_queries, BM25Params(), k=10)
    extra["two_wave_pairs_total"] = pc["pairs_total"]
    extra["two_wave_pairs_skipped"] = pc["pairs_skipped"]
    # scale-transferable metric: fraction of posting entries the pruned
    # path decodes+scores — per-pair kernel work is what dominates at
    # 10^12 docs, while local wall-clock is mostly fixed stage constants
    extra["two_wave_postings_frac"] = round(
        pc["postings_scored"] / max(pc["postings_total"], 1), 4)
    shutil.rmtree(os.path.dirname(skew_dir), ignore_errors=True)

    # -- headline contract queries at the sf dir ----------------------------
    # (exact ngram_jaccard is the sf0.01 oracle variant — quadratic by
    # design; the scale-path dedup ops benched here are minhash + simhash)
    headline = ["bm25_topk", "term_stats", "knn_cosine",
                "events_hourly", "fingerprint", "minhash_lsh_pairs",
                "simhash_pairs", "dedup_exact_stats", "keyphrase_extract",
                "tag_metrics", "generation_topk"]
    for name in headline:
        fn, _sql = contract.QUERIES[name]
        # best-of-3: the shared host shows CPU-steal spikes that can 3×
        # a single measurement (documented in BASELINE.md); min time is
        # the standard contention-robust estimator. Repeats are NOT
        # cache hits: the catalog cache is cleared between runs.
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # drop leaked caches between queries so one query's working
            # set doesn't tax the next
            spark.catalog.clearCache()
        timings[name] = best

    total = sum(timings.values())
    out = {
        "metric": "index-build docs/sec + top-10 BM25 q/s + headline query secs",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": cpus,
        "bench_corpus_docs": n_docs,
        "index_build_docs_per_sec": round(extra["index_build_docs_per_sec"], 1),
        "bm25_queries_per_sec": round(extra["bm25_queries_per_sec"], 1),
        "bm25_batch_queries_per_sec": round(extra["bm25_batch_queries_per_sec"], 1),
        "wand_queries_per_sec": round(extra["wand_queries_per_sec"], 1),
        "compact_query_sec_before": extra["compact_query_sec_before"],
        "compact_query_sec_after": extra["compact_query_sec_after"],
        "two_wave_pairs_total": extra["two_wave_pairs_total"],
        "two_wave_pairs_skipped": extra["two_wave_pairs_skipped"],
        "two_wave_postings_frac": extra["two_wave_postings_frac"],
    }
    shutil.rmtree(os.path.dirname(src_dir), ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
