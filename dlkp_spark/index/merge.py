"""Log-structured segment merge (compaction) for the posting index.

Doc-range segments are the engine's LSM "runs": incremental ingest (see
dlkp_spark.streaming.ingest) appends new small segments; compaction merges
``factor`` adjacent doc-range segments into one, re-encoding each term's
sub-lists into a single posting list. Because segments partition the
doc-id space in order, merged doc-id arrays are concatenations of
already-sorted runs — no re-sort, one pass.

The merge is itself checkpointed: output is written to a new index dir with
fresh manifests (atomic rename), so a killed merge leaves the source index
intact (north_rule resumability).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dlkp_spark.config import IndexConfig
from dlkp_spark.index import manifest as mf
from dlkp_spark.index.build import POSTINGS_SCHEMA, load_postings, load_stats
from dlkp_spark.index.codec import decode_postings, encode_postings
from dlkp_spark.oracle import idf as idf_fn


def merge_segments(spark: SparkSession, index_dir: str, out_dir: str,
                   factor: int = 2, cfg: IndexConfig | None = None) -> dict:
    """Compact: segment' = segment // factor. Returns merge metrics."""
    cfg = cfg or IndexConfig()
    stats = load_stats(index_dir)
    avgdl = stats["avgdl"]
    n_docs = stats["n_docs"]

    postings = (load_postings(spark, index_dir)
                .withColumn("new_segment", (F.col("segment") / factor).cast("long")))

    key = ["term", "field", "new_segment"]

    def merge_group(g: pd.DataFrame) -> dict:
        g = g.sort_values("segment")
        docs_parts, tfs_parts, dls_parts = [], [], []
        for r in g.itertuples(index=False):
            d, t, dl = decode_postings(r.docs_vb, r.tfs_vb, r.dls_vb)
            docs_parts.append(d)
            tfs_parts.append(t)
            dls_parts.append(dl)
        field = int(g["field"].iloc[0])
        enc = encode_postings(
            np.concatenate(docs_parts), np.concatenate(tfs_parts),
            np.concatenate(dls_parts),
            idf=idf_fn(n_docs, int(g["df"].iloc[0])),
            avgdl=avgdl[field], p=cfg.bm25, block_size=cfg.block_size)
        return {
            "term": g["term"].iloc[0], "field": field,
            "segment": int(g["new_segment"].iloc[0]),
            "df": int(g["df"].iloc[0]), "n_postings": enc["n_postings"],
            "docs_vb": enc["docs_vb"], "tfs_vb": enc["tfs_vb"],
            "dls_vb": enc["dls_vb"], "block_max": enc["block_max"],
            "block_last": enc["block_last"], "max_contrib": enc["max_contrib"],
        }

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if pdf.empty:
                carry = None
                continue
            last_key = tuple(pdf[key].iloc[-1])
            is_last = (pdf[key] == last_key).all(axis=1)
            carry = pdf[is_last].copy()
            body = pdf[~is_last]
            if not body.empty:
                yield pd.DataFrame([merge_group(g) for _, g in body.groupby(key, sort=False)])
        if carry is not None and not carry.empty:
            yield pd.DataFrame([merge_group(g) for _, g in carry.groupby(key, sort=False)])

    merged = (postings
              .repartition(cfg.n_term_partitions, "term", "field", "new_segment")
              .sortWithinPartitions("term", "field", "new_segment", "segment")
              .mapInPandas(kernel, POSTINGS_SCHEMA))

    tmp = out_dir + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "segments", "shard=0"))
    n_rows = spark.read.parquet(os.path.join(tmp, "segments")).count()
    os.makedirs(tmp, exist_ok=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    new_stats = dict(stats)
    new_stats["segment_docs"] = stats.get("segment_docs", cfg.segment_docs) * factor
    new_stats["avgdl"] = {str(k): v for k, v in avgdl.items()}
    mf.write_global(out_dir, "stats.json", new_stats)
    mf.write_shard_manifest(out_dir, 0, {
        "shard": 0, "status": "committed",
        "config_hash": new_stats.get("config_hash", ""),
        "posting_rows": n_rows,
        "lineage": {"merged_from": index_dir, "factor": factor},
    })
    return {"posting_rows": n_rows, "factor": factor}
