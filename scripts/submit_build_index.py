#!/usr/bin/env python
"""spark-submit entrypoint: build the inverted index over a web-pages table.

Cluster usage (north_rule: spark-submit --py-files on multi-executor
clusters):

    python scripts/package.py                      # → dist/dlkp_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/dlkp_spark.zip \
        scripts/submit_build_index.py \
        --input  <parquet-or-iceberg path of (url, warc_ts, html, text, lang)> \
        --output <index dir> \
        --shards 16 --segment-docs 8388608 --resume

Local smoke:

    python scripts/submit_build_index.py --generate 5000 --output /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of web pages (url, warc_ts, html, text, lang)")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate a deterministic synthetic corpus of N docs instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--segment-docs", type=int, default=4096)
    ap.add_argument("--block-size", type=int, default=64)
    ap.add_argument("--term-partitions", type=int, default=0,
                    help="0 = default parallelism")
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--no-validate", dest="validate", action="store_false", default=True)
    args = ap.parse_args()

    from dlkp_spark.config import IndexConfig
    from dlkp_spark.contract import ensure_shipped
    from dlkp_spark.corpus import generate_web_pages
    from dlkp_spark.index.build import build_index, prepare_docs
    from dlkp_spark.session import get_spark

    spark = get_spark("dlkp_spark_build")
    ensure_shipped(spark)
    if args.generate:
        pages = generate_web_pages(spark, args.generate, seed=42)
    else:
        assert args.input, "--input or --generate required"
        pages = spark.read.parquet(args.input)

    cfg = IndexConfig(
        segment_docs=args.segment_docs, block_size=args.block_size,
        n_term_partitions=args.term_partitions or spark.sparkContext.defaultParallelism)
    # count the RAW pages (column-pruned scan / metadata) so the tagger
    # never runs an extra pass just to learn the corpus size
    n_docs = pages.count()
    docs = prepare_docs(pages, validate=args.validate, n_docs=n_docs)
    metrics = build_index(spark, docs, args.output, cfg=cfg,
                          n_shards=args.shards, resume=args.resume,
                          n_docs=n_docs)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
