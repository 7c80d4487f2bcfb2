#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Measures the two north-star metrics plus headline contract queries:
  - index_build: SPIMI build (analyze → tag → encode → commit) over a
    deterministic generated web corpus  → docs/sec
  - wand_query: batch block-max WAND top-10 over the built index for the
    reference query set → queries/sec
  - headline driver-contract queries at $SPARK_GRAFT_SF_DIR

Each SECTION runs in its own subprocess (fresh JVM + fresh Python
workers), the same isolation discipline scripts/bench_scaling.py uses
for its levels: a measured r5 regression showed ~500 accumulated stages
of one long-lived local-mode JVM taxing every later query 3–5×
(term_stats 4.2 s in-bench vs 1.2 s in a fresh JVM, same minute, same
host) — residue a real cluster's per-job executor provisioning never
sees. JVM startup/warmup is untimed either way.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_N_DOCS (default 20000) — generated corpus size for the build/query bench.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "20000"))


def _best_of(spark, fn, n=3):
    # best-of-3 for the cheap query metrics (seconds each): a single
    # host-steal spike contaminated BOTH runs of a best-of-2 in one
    # recorded window (wand 24.9 s vs its 4–8 s isolation range).
    # Repeats are NOT cache hits: the catalog cache is cleared between.
    b = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        b = dt if b is None else min(b, dt)
        spark.catalog.clearCache()
    return b


def section_core() -> tuple[dict, dict]:
    """Index build + batch/WAND queries + LSM compaction cycle."""
    from dlkp_spark.cache import release_cached
    from dlkp_spark.config import BM25Params, IndexConfig
    from dlkp_spark.corpus import generate_web_pages
    from dlkp_spark.index.build import build_index, prepare_docs
    from dlkp_spark.index.merge import merge_segments
    from dlkp_spark.oracle import reference_query_set
    from dlkp_spark.query.wand import batch_topk, wand_topk
    from dlkp_spark.session import get_spark

    spark = get_spark("bench_core", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # corpus parquet is the engine INPUT (stand-in for the Iceberg table) —
    # generating it is not part of the measured build
    src_dir = tempfile.mkdtemp(prefix="bench_pages_") + "/pages"
    generate_web_pages(spark, N_DOCS, seed=42).write.parquet(src_dir)
    pages = spark.read.parquet(src_dir)

    # -- index build (analyze → tag → ids → encode → commit) ----------------
    # best-of-2 like every other number here: the shared host's CPU-steal
    # spikes can 2× a single-shot measurement (BASELINE.md), and the
    # round-2 artifact recorded exactly that artifact-vs-claim mismatch.
    # n_shards=2 matches the contract's WAND query layout; since round 3
    # all shards encode in ONE job, so shard count no longer multiplies
    # job barriers.
    cfg = IndexConfig(segment_docs=2048, block_size=64, n_term_partitions=CPUS)
    idx_dir = None
    best = None
    for _ in range(2):
        d = tempfile.mkdtemp(prefix="bench_idx_")
        t0 = time.perf_counter()
        docs = prepare_docs(pages, validate=True, n_docs=N_DOCS)
        build_index(spark, docs, d, cfg=cfg, n_shards=2, resume=False,
                    n_docs=N_DOCS)
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
    extra["index_build_docs_per_sec"] = round(N_DOCS / best, 1)

    # -- top-10 BM25 over the compressed index (best-of each) ---------------
    queries = reference_query_set(n_queries=200)
    big_queries = reference_query_set(n_queries=2000)
    timings["bm25_batch_200q"] = _best_of(spark,
        lambda: batch_topk(spark, idx_dir, queries, BM25Params(), k=10).count())
    extra["bm25_queries_per_sec"] = round(
        len(queries) / timings["bm25_batch_200q"], 1)
    timings["bm25_batch_2000q"] = _best_of(spark,
        lambda: batch_topk(spark, idx_dir, big_queries, BM25Params(), k=10).count())
    extra["bm25_batch_queries_per_sec"] = round(
        len(big_queries) / timings["bm25_batch_2000q"], 1)
    timings["wand_20q"] = _best_of(spark,
        lambda: wand_topk(spark, idx_dir, queries[:20], BM25Params(), k=10).count())
    extra["wand_queries_per_sec"] = round(20 / timings["wand_20q"], 1)

    # -- LSM compaction cycle: many small streamed segments → merge ---------
    # measures that compaction (a) runs at bench scale and (b) actually
    # buys query latency back on a fragmented index
    frag_cfg = IndexConfig(segment_docs=256, block_size=64,
                           n_term_partitions=CPUS)
    frag_dir = tempfile.mkdtemp(prefix="bench_frag_")
    build_index(spark, prepare_docs(pages, validate=False, n_docs=N_DOCS),
                frag_dir, cfg=frag_cfg, n_shards=1, resume=False, n_docs=N_DOCS)
    release_cached()
    spark.catalog.clearCache()
    pre = _best_of(spark,
        lambda: batch_topk(spark, frag_dir, queries, BM25Params(), k=10).count())
    # factor=2 (79 → 40 segments), NOT a deeper merge: batch_topk
    # parallelizes by segment, so compacting below ~#cores groups trades
    # decode overhead for lost parallelism (measured: 79→10 segments on
    # 32 cores made the after-query SLOWER in some windows). The scale
    # rule: compaction must keep #segments >> cluster parallelism.
    # best-of-2 like every other number: a single-shot merge measurement
    # caught a 5x host-steal spike in one recorded window (r5)
    merged_dir = None
    best = None
    for _ in range(2):
        d = tempfile.mkdtemp(prefix="bench_merged_") + "/idx"
        t0 = time.perf_counter()
        merge_segments(spark, frag_dir, d, factor=2, cfg=frag_cfg)
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
            if merged_dir:
                shutil.rmtree(os.path.dirname(merged_dir), ignore_errors=True)
            merged_dir = d
        else:
            shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    timings["compact_merge"] = best
    post = _best_of(spark,
        lambda: batch_topk(spark, merged_dir, queries, BM25Params(), k=10).count())
    extra["compact_query_sec_before"] = round(pre, 3)
    extra["compact_query_sec_after"] = round(post, 3)
    shutil.rmtree(frag_dir, ignore_errors=True)
    shutil.rmtree(os.path.dirname(merged_dir), ignore_errors=True)
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(os.path.dirname(src_dir), ignore_errors=True)
    spark.stop()
    return timings, extra


def section_selective() -> tuple[dict, dict]:
    """Two-wave segment pruning on a SELECTIVE query set — the 100×-scale
    path (round-5 item #1): a skewed corpus where each query's top-k is
    decided inside one doc-range segment while the term still appears
    (tf 1–3 noise) in EVERY segment — so the term-match join prunes
    nothing and only the metadata upper-bound gate can skip work."""
    from pyspark.sql import functions as F

    from dlkp_spark.config import BM25Params, IndexConfig
    from dlkp_spark.index.build import build_index
    from dlkp_spark.query.wand import batch_topk, two_wave_pair_counts
    from dlkp_spark.session import get_spark

    spark = get_spark("bench_sel", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    seg_docs = 256
    n_hot = min(50, N_DOCS // seg_docs)
    # corpus generated FULLY Spark-side (a driver-side 20k × ~120-token
    # python list held the rest of the bench hostage to GC pressure):
    # docs in segment s < n_hot carry "hot{s}" at tf 8; EVERY doc carries
    # every hot term at tf 1-3 noise
    seg = (F.col("doc_id") / F.lit(seg_docs)).cast("long")
    base = F.array(*([F.lit("the")] * 6
                     + [F.lit("data"), F.lit("query"), F.lit("filler")]))
    own = F.when(seg < n_hot,
                 F.array_repeat(F.concat(F.lit("hot"), seg.cast("string")), 8)
                 ).otherwise(F.array().cast("array<string>"))
    noise = F.flatten(F.transform(
        F.sequence(F.lit(0), F.lit(n_hot - 1)),
        lambda j: F.array_repeat(
            F.concat(F.lit("hot"), j.cast("string")),
            (F.lit(1) + F.pmod(F.col("doc_id") * 7 + j, F.lit(3))).cast("int"))))
    skew_docs = (spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
                 .repartition(CPUS, "doc_id")
                 .withColumn("tokens", F.concat(base, own, noise))
                 .withColumn("keyphrases", F.array().cast("array<string>")))
    cfg = IndexConfig(segment_docs=seg_docs, block_size=64,
                      n_term_partitions=CPUS)
    skew_dir = tempfile.mkdtemp(prefix="bench_skew_") + "/idx"
    build_index(spark, skew_docs, skew_dir, cfg=cfg, n_shards=1,
                resume=False, n_docs=N_DOCS)
    sel_queries = [(j, [f"hot{j}"]) for j in range(n_hot)]
    timings["bm25_selective_1wave"] = _best_of(spark,
        lambda: batch_topk(spark, skew_dir, sel_queries, BM25Params(), k=10).count())
    timings["bm25_selective_2wave"] = _best_of(spark,
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
    spark.stop()
    return timings, extra


def section_surface() -> tuple[dict, dict]:
    """Round-5 query surface over ONE positional + attribute index:
    exact/sloppy phrase, prefix expansion, conjunctive AND, metadata
    filters, tombstone masking. One build (untimed), each query best-of-3."""
    from dlkp_spark.cache import release_cached
    from dlkp_spark.config import BM25Params, IndexConfig
    from dlkp_spark.corpus import KNOWN_KEYPHRASES, generate_web_pages
    from dlkp_spark.index.build import build_index, prepare_docs
    from dlkp_spark.oracle import reference_query_set
    from dlkp_spark.query.phrase import phrase_topk
    from dlkp_spark.query.wand import (batch_topk, collapse_topk,
                                       dismax_topk, fuzzy_topk,
                                       match_counts, prefix_topk,
                                       synonym_topk, wildcard_topk)
    from dlkp_spark.session import get_spark

    spark = get_spark("bench_surface", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    p = BM25Params()

    src_dir = tempfile.mkdtemp(prefix="bench_spages_") + "/pages"
    generate_web_pages(spark, N_DOCS, seed=42).write.parquet(src_dir)
    pages = spark.read.parquet(src_dir)
    idx = tempfile.mkdtemp(prefix="bench_sidx_") + "/idx"
    docs = (prepare_docs(pages, validate=False, n_docs=N_DOCS)
            .select("doc_id", "tokens", "keyphrases", "lang"))
    cfg = IndexConfig(segment_docs=2048, block_size=64,
                      n_term_partitions=CPUS, positions=True)
    build_index(spark, docs, idx, cfg=cfg, n_shards=2, resume=False,
                n_docs=N_DOCS, attrs=("lang",))
    release_cached()
    spark.catalog.clearCache()

    phrases = [(i, kp.split()) for i, kp in enumerate(KNOWN_KEYPHRASES)]
    timings["phrase_5q"] = _best_of(spark,
        lambda: phrase_topk(spark, idx, phrases, p, k=10).count())
    timings["sloppy_phrase_5q"] = _best_of(spark,
        lambda: phrase_topk(spark, idx, phrases, p, k=10, slop=3).count())
    prefixes = [(0, ["w00"]), (1, ["w01"]), (2, ["w1"])]
    timings["prefix_3q"] = _best_of(spark,
        lambda: prefix_topk(spark, idx, prefixes, p, k=10).count())
    queries = reference_query_set(n_queries=200)
    timings["conjunctive_200q"] = _best_of(spark,
        lambda: batch_topk(spark, idx, queries, p, k=10,
                           conjunctive=True).count())
    timings["filtered_200q"] = _best_of(spark,
        lambda: batch_topk(spark, idx, queries, p, k=10,
                           filters={"lang": ["en"]}).count())
    dels = spark.range(0, N_DOCS, 10).withColumnRenamed("id", "doc_id")
    timings["deleted_200q"] = _best_of(spark,
        lambda: batch_topk(spark, idx, queries, p, k=10,
                           deletes=dels).count())
    # round-5 session-2 surface: fuzzy/wildcard expansion, synonym blend,
    # dismax combiner, total-hit counts — all over the same hot index
    fuzzies = [(i, [t[:1] + t[2:] for t in terms])  # char-dropped typos
               for i, terms in queries[:20]]
    timings["fuzzy_20q"] = _best_of(spark,
        lambda: fuzzy_topk(spark, idx, fuzzies, p, k=10,
                           max_edits=1, prefix_len=1).count())
    wilds = [(0, "w00*"), (1, "w01?"), (2, "*5"), (3, "w1*")]
    timings["wildcard_4q"] = _best_of(spark,
        lambda: wildcard_topk(spark, idx, wilds, p, k=10).count())
    syns = [(i, [list(terms)] if len(terms) > 1 else list(terms))
            for i, terms in queries[:50]]
    timings["synonym_50q"] = _best_of(spark,
        lambda: synonym_topk(spark, idx, syns, p, k=10).count())
    timings["dismax_200q"] = _best_of(spark,
        lambda: dismax_topk(spark, idx, queries, p, k=10, tie=0.3).count())
    timings["match_counts_200q"] = _best_of(spark,
        lambda: match_counts(spark, idx, queries).count())
    timings["collapse_200q"] = _best_of(spark,
        lambda: collapse_topk(spark, idx, queries, "lang", p, k=10).count())
    neg = {qid: [terms[-1]] for qid, terms in queries[:100]}
    timings["must_not_200q"] = _best_of(spark,
        lambda: batch_topk(spark, idx, queries, p, k=10,
                           must_not=neg).count())
    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
    shutil.rmtree(os.path.dirname(src_dir), ignore_errors=True)
    spark.stop()
    return timings, {}


def _run_contract_queries(names: list[str], app: str) -> dict:
    """One fresh JVM per call — the headline list outgrew a single
    session (the accumulated-stage tax documented in BASELINE.md showed
    up again on the round-5 tail entries: lm_perplexity 8.3 s in a
    25-query JVM vs 3.1 s fresh)."""
    from dlkp_spark import contract
    from dlkp_spark.session import get_spark

    spark = get_spark(app, master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    # one UNTIMED pass of the first query: a cold local JVM charges
    # worker spawn + codegen infrastructure + parquet footer caching to
    # whatever runs first (measured iter0 11.4 s vs steady-state 1.1 s
    # for domain_mix_sample) — warmup cost a long-lived cluster pays
    # once at provisioning, not per query
    warm_fn, _ = contract.QUERIES[names[0]]
    warm_fn(spark, SF_DIR).count()
    spark.catalog.clearCache()
    timings: dict[str, float] = {}
    for name in names:
        fn, _sql = contract.QUERIES[name]
        timings[name] = _best_of(spark, lambda: fn(spark, SF_DIR).count())
    spark.stop()
    return timings


def section_headline() -> tuple[dict, dict]:
    """Headline contract queries at the sf dir. (Exact ngram_jaccard is
    the sf0.01 oracle variant — quadratic by design; the scale-path dedup
    ops benched here are minhash + simhash.)"""
    return _run_contract_queries(
        ["bm25_topk", "term_stats", "knn_cosine",
         "events_hourly", "fingerprint", "minhash_lsh_pairs",
         "simhash_pairs", "dedup_exact_stats", "keyphrase_extract",
         "tag_metrics", "generation_topk", "ngram_contamination"],
        "bench_hl"), {}


def section_curation() -> tuple[dict, dict]:
    """Round-5 curation/pipeline operators, in their own JVM."""
    return _run_contract_queries(
        ["domain_mix_sample", "repetition_stats", "lm_perplexity",
         "span_dedup", "redact_pii", "tfidf_keywords",
         "chunk_documents", "curate_webtext"],
        "bench_cur"), {}


SECTIONS = {"core": section_core, "selective": section_selective,
            "surface": section_surface,
            "headline": section_headline, "curation": section_curation}


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--section":
        timings, extra = SECTIONS[sys.argv[2]]()
        print("SECTION_RESULT " + json.dumps({"timings": timings, "extra": extra}))
        return

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    for name in ("core", "selective", "surface", "headline", "curation"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("SECTION_RESULT ")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(f"bench section {name} failed")
        r = json.loads(lines[-1][len("SECTION_RESULT "):])
        timings.update(r["timings"])
        extra.update(r["extra"])

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    out = {
        "metric": "index-build docs/sec + top-10 BM25 q/s + headline query secs",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": CPUS,
        "bench_corpus_docs": N_DOCS,
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
