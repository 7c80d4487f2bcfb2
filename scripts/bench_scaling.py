#!/usr/bin/env python
"""Scaling evidence: same job at two parallelism levels (north_rule).

No real cluster exists in this sandbox, so per driver instruction the
two-cluster-size criterion (N vs 4N executors, efficiency >= 0.8) is
evidenced by running the identical job at local[8] and local[32] on the
same on-disk input and reporting throughput at both.

Writes one JSON line; results are recorded in BASELINE.md.

Usage: python scripts/bench_scaling.py [n_docs] [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 200
LEVELS = [8, 32]


def run_level(cpus: int, src: str) -> dict:
    from dlkp_spark.config import BM25Params, IndexConfig
    from dlkp_spark.contract import ensure_shipped
    from dlkp_spark.index.build import build_index, prepare_docs
    from dlkp_spark.oracle import reference_query_set
    from dlkp_spark.query.wand import batch_topk
    from dlkp_spark.session import get_spark

    spark = get_spark(f"scal{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    ensure_shipped(spark)
    cfg = IndexConfig(segment_docs=1024, block_size=64, n_term_partitions=cpus)
    idx = tempfile.mkdtemp(prefix=f"scal_idx_{cpus}_")
    pages = spark.read.parquet(src)

    t0 = time.perf_counter()
    docs = prepare_docs(pages, validate=True)
    build_index(spark, docs, idx, cfg=cfg, n_shards=1, resume=False)
    build_s = time.perf_counter() - t0
    spark.catalog.clearCache()

    queries = reference_query_set(n_queries=N_QUERIES)
    # warm one tiny query so JIT/codegen warmup is not charged to the metric
    batch_topk(spark, idx, queries[:1], BM25Params(), k=10).count()
    t0 = time.perf_counter()
    batch_topk(spark, idx, queries, BM25Params(), k=10).count()
    query_s = time.perf_counter() - t0

    spark.stop()
    shutil.rmtree(idx, ignore_errors=True)
    return {
        "cpus": cpus,
        "build_sec": round(build_s, 2),
        "build_docs_per_sec": round(N_DOCS / build_s, 1),
        "query_sec": round(query_s, 2),
        "queries_per_sec": round(N_QUERIES / query_s, 1),
    }


def main() -> None:
    # corpus written once, read by both levels (the "cluster input table")
    from dlkp_spark.corpus import generate_web_pages
    from dlkp_spark.session import get_spark

    src = tempfile.mkdtemp(prefix="scal_pages_") + "/pages"
    boot = get_spark("scal_gen", master="local[32]", shuffle_partitions=32)
    generate_web_pages(boot, N_DOCS, seed=42).write.parquet(src)
    boot.stop()

    results = {lvl: run_level(lvl, src) for lvl in LEVELS}
    lo, hi = results[LEVELS[0]], results[LEVELS[1]]
    factor = LEVELS[1] / LEVELS[0]
    out = {
        "n_docs": N_DOCS,
        "n_queries": N_QUERIES,
        "levels": results,
        "build_scaling_efficiency": round(
            (hi["build_docs_per_sec"] / lo["build_docs_per_sec"]) / factor, 3),
        "query_scaling_efficiency": round(
            (hi["queries_per_sec"] / lo["queries_per_sec"]) / factor, 3),
    }
    shutil.rmtree(os.path.dirname(src), ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
