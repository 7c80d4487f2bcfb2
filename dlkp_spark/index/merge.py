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
from dlkp_spark.index.build import (POSTINGS_SCHEMA, POSTINGS_SCHEMA_POS,
                                    load_postings, load_stats)
from dlkp_spark.index.codec import (decode_positions, decode_postings_batch,
                                    delta_decode, encode_positions,
                                    encode_postings, encode_postings_multi,
                                    varbyte_decode)
from dlkp_spark.oracle import idf as idf_fn


def _delete_adjustments(spark, postings, stats: dict) -> tuple[dict, "object", int]:
    """One metadata pass over tombstone-joined postings → exact new stats
    + per-(term, field) surviving doc frequencies.

    Emits a union-schema row stream from one kernel (kind 0 = surviving
    posting count per row; kind 1 = a deleted-and-present (doc_id, field,
    dl) observation). Rows without tombstones skip the decode entirely —
    cost scales with the segments deletes actually touch, not the index.
    Aggregation gives:

    - df′(term, field) = Σ surviving counts (segments partition doc ids,
      so each doc counts once per (term, field));
    - n_docs′ = n_docs − |distinct deleted docs PRESENT in the index|
      (tombstones for unknown ids are no-ops);
    - dl_sums′[f] = dl_sums[f] − Σ dl over deleted docs having field f
      (each (doc_id, field) observation carries the same dl in every
      posting row — deduped exactly by DISTINCT).
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, terms, fields, a_col, b_col = [], [], [], [], []
            for i in range(len(pdf)):
                dele = pdf["del_ids"].iloc[i]
                if dele is None or not len(dele):
                    kinds.append(0)
                    terms.append(pdf["term"].iloc[i])
                    fields.append(int(pdf["field"].iloc[i]))
                    a_col.append(int(pdf["n_postings"].iloc[i]))
                    b_col.append(0)
                    continue
                docs = delta_decode(
                    varbyte_decode(pdf["docs_vb"].iloc[i]).astype(np.int64))
                dls = varbyte_decode(pdf["dls_vb"].iloc[i]).astype(np.int64)
                m = np.isin(docs, np.asarray(dele, dtype=np.int64))
                kinds.append(0)
                terms.append(pdf["term"].iloc[i])
                fields.append(int(pdf["field"].iloc[i]))
                a_col.append(int((~m).sum()))
                b_col.append(0)
                for d, dl in zip(docs[m], dls[m]):
                    kinds.append(1)
                    terms.append("")
                    fields.append(int(pdf["field"].iloc[i]))
                    a_col.append(int(d))
                    b_col.append(int(dl))
            yield pd.DataFrame({"kind": kinds, "term": terms, "field": fields,
                                "a": a_col, "b": b_col})

    rows = (postings.select("term", "field", "n_postings", "docs_vb",
                            "dls_vb", "del_ids")
            .mapInPandas(kernel, "kind int, term string, field int, a long, b long")
            .persist())
    try:
        gdf = (rows.filter(F.col("kind") == 0)
               .groupBy("term", "field").agg(F.sum("a").alias("new_df")))
        del_docs = (rows.filter(F.col("kind") == 1)
                    .select("field", F.col("a").alias("doc_id"),
                            F.col("b").alias("dl")).distinct())
        agg = del_docs.groupBy("field").agg(
            F.sum("dl").alias("dl_removed"),
            F.countDistinct("doc_id").alias("n")).collect()
        n_deleted = (del_docs.select("doc_id").distinct().count())
        removed = {int(r["field"]): int(r["dl_removed"]) for r in agg}
        new_stats = dict(stats)
        new_stats["n_docs"] = stats["n_docs"] - n_deleted
        if new_stats["n_docs"] <= 0:
            # data-dependent invariant — must survive python -O (a bare
            # assert is stripped and the purge would divide by zero
            # computing avgdl, leaving a partially written output dir)
            raise ValueError("deletes would empty the index")
        new_stats["dl_sums"] = {
            f: stats["dl_sums"][f] - removed.get(f, 0) for f in (0, 1)}
        new_stats["avgdl"] = {
            f: new_stats["dl_sums"][f] / new_stats["n_docs"] for f in (0, 1)}
        # materialize gdf before rows is unpersisted (it feeds the join)
        gdf = gdf.localCheckpoint(eager=True)
    finally:
        rows.unpersist()
    return new_stats, gdf, n_deleted


def merge_segments(spark: SparkSession, index_dir: str, out_dir: str,
                   factor: int = 2, cfg: IndexConfig | None = None,
                   n_shards: int = 4, resume: bool = True,
                   deletes=None) -> dict:
    """Compact: segment' = segment // factor. Returns merge metrics.

    ``deletes`` (DataFrame with a ``doc_id`` column) PURGES tombstoned
    docs during the re-encode: their postings are dropped, and the output's
    statistics are recomputed exactly (n_docs, per-field dl_sums/avgdl,
    per-(term, field) df — hence idf and block-max metadata), so queries
    over the compacted index are bit-identical to a from-scratch build of
    the surviving corpus with the same doc ids (tests/test_deletes.py).

    Since round 5 the merged output commits SHARD-GRAINED, exactly like the
    build (shard = merged segment % n_shards, all shards encoded in one
    ``write.partitionBy`` job, each committed atomically with its own
    manifest): a killed merge of a large index resumes from the committed
    shards instead of restarting from zero — re-encoding only the
    uncommitted remainder to an identical index (kill-window test in
    tests/test_merge.py).

    Pick ``factor`` so the OUTPUT segment count stays well above the
    cluster's parallelism: query kernels (batch_topk/wand_topk) fan out
    one task per segment, so over-compacting trades per-list decode
    overhead for lost parallel granularity (measured on 32 local cores:
    79→10 segments made the post-compaction batch query slower in some
    runs; 79→40 keeps every core busy AND halves per-list overhead).

    When no cfg is given, the re-encode inherits the SOURCE index's
    block_size (from its stats.json) rather than IndexConfig()'s default —
    the written stats always carry the block_size the blocks were actually
    encoded with (see _merge_write), so wand_topk's block-stride indexing
    can never go stale.
    """
    import dataclasses

    stats = load_stats(index_dir)
    if cfg is None:
        cfg = IndexConfig()
        if "block_size" in stats:
            cfg = dataclasses.replace(cfg, block_size=int(stats["block_size"]))
    postings = (load_postings(spark, index_dir)
                .withColumn("new_segment", (F.col("segment") / factor).cast("long")))
    lineage = {"merged_from": index_dir, "factor": factor}
    # append high-water mark: purged ids are never reused, so the ceiling
    # carries from the source unchanged (n_docs shrinks; the id space not)
    stats["doc_id_ceiling"] = int(stats.get("doc_id_ceiling", stats["n_docs"]))
    purge = deletes is not None
    seg_del = None
    if purge:
        seg_docs = int(stats.get("segment_docs") or cfg.segment_docs)
        seg_del = (deletes.select("doc_id").distinct()
                   .groupBy((F.col("doc_id") / F.lit(seg_docs))
                            .cast("long").alias("segment"))
                   .agg(F.sort_array(F.collect_list("doc_id")).alias("del_ids")))
        postings = postings.join(seg_del, "segment", "left")
        stats, gdf, n_deleted = _delete_adjustments(spark, postings, stats)
        postings = (postings.drop("df").join(gdf, ["term", "field"])
                    .withColumnRenamed("new_df", "df"))
        lineage["deletes_purged"] = n_deleted
    out = _merge_write(spark, postings, stats, out_dir, cfg,
                       lineage=lineage,
                       segment_docs=stats.get("segment_docs", cfg.segment_docs) * factor,
                       n_shards=n_shards, resume=resume, purge=purge)
    _carry_sidecars(spark, index_dir, out_dir, factor, seg_del, deletes)
    return out


def _carry_sidecars(spark: SparkSession, index_dir: str, out_dir: str,
                    factor: int, seg_del, deletes) -> None:
    """Compaction carries the attribute-postings and doc-map sidecars.

    Attr doc lists re-key to the merged segments (segment // factor, the
    same remap as the postings) with tombstoned ids purged; the doc map
    copies minus tombstones. Without this, filtered search on a compacted
    index would lose its sidecar (stats still advertises ``attrs``).
    """
    attrs_src = os.path.join(index_dir, "attrs")
    if os.path.isdir(attrs_src):
        from dlkp_spark.index.build import ATTRS_SCHEMA, load_attrs
        from dlkp_spark.index.codec import delta_encode, varbyte_encode

        rows = (load_attrs(spark, index_dir)
                .withColumn("new_segment",
                            (F.col("segment") / factor).cast("long")))
        if seg_del is not None:
            rows = rows.join(seg_del, "segment", "left")
        purge = seg_del is not None

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            key = ["attr", "value", "new_segment"]
            carry: pd.DataFrame | None = None

            def encode(pdf: pd.DataFrame) -> pd.DataFrame:
                out: dict[str, list] = {c: [] for c in
                                        ("attr", "value", "segment",
                                         "n_docs", "docs_vb")}
                for (a, v, seg), g in pdf.groupby(key, sort=True):
                    parts = []
                    for i in range(len(g)):
                        ids = delta_decode(varbyte_decode(
                            g["docs_vb"].iloc[i]).astype(np.int64))
                        if purge:
                            dele = g["del_ids"].iloc[i]
                            if dele is not None and len(dele):
                                ids = ids[~np.isin(
                                    ids, np.asarray(dele, dtype=np.int64))]
                        if len(ids):
                            parts.append(ids)
                    if not parts:
                        continue
                    parts.sort(key=lambda x: int(x[0]))
                    ids = np.concatenate(parts)
                    out["attr"].append(a)
                    out["value"].append(v)
                    out["segment"].append(int(seg))
                    out["n_docs"].append(len(ids))
                    out["docs_vb"].append(varbyte_encode(delta_encode(ids)))
                return pd.DataFrame(out)

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
                    res = encode(body)
                    if len(res):
                        yield res
            if carry is not None and not carry.empty:
                res = encode(carry)
                if len(res):
                    yield res

        enc = (rows.repartition("attr", "value", "new_segment")
               .sortWithinPartitions("attr", "value", "new_segment", "segment")
               .mapInPandas(kernel, ATTRS_SCHEMA))
        tmp = os.path.join(out_dir, "_tmp_attrs")
        shutil.rmtree(tmp, ignore_errors=True)
        enc.write.mode("overwrite").parquet(tmp)
        final = os.path.join(out_dir, "attrs")
        shutil.rmtree(final, ignore_errors=True)
        mf.commit_dataset(tmp, final)

    dm_src = os.path.join(index_dir, "docmap")
    if os.path.isdir(dm_src):
        dm = spark.read.parquet(dm_src)
        if deletes is not None:
            dm = dm.join(deletes.select("doc_id").distinct(),
                         "doc_id", "left_anti")
        tmp = os.path.join(out_dir, "_tmp_docmap")
        shutil.rmtree(tmp, ignore_errors=True)
        dm.write.mode("overwrite").parquet(tmp)
        final = os.path.join(out_dir, "docmap")
        shutil.rmtree(final, ignore_errors=True)
        mf.commit_dataset(tmp, final)


def reconcile_stream(spark: SparkSession, index_dir: str, out_dir: str,
                     cfg: IndexConfig | None = None,
                     n_shards: int = 4, resume: bool = True) -> dict:
    """Fold streamed batch sub-indexes into one globally-consistent index.

    Streamed batches (streaming/ingest.py) carry batch-local stats, so
    their df/idf/block-max metadata is only locally admissible. This pass:

    1. combines exact global stats from every sub-index's integer dl_sums
       and n_docs (Σ/Σ — bit-exact, no float accumulation ambiguity);
    2. recomputes global df per (term, field) = Σ per-segment n_postings
       (doc ranges are disjoint across batches by construction);
    3. re-encodes every posting list with global idf/avgdl block-max
       metadata, merging same-(term, field, segment) sub-lists.

    After reconcile, queries over the output are exact global BM25 —
    identical scoring to a from-scratch batch build over the union corpus.
    """
    import glob as _glob

    cfg = cfg or IndexConfig()
    sub_dirs = sorted(_glob.glob(os.path.join(index_dir, "stream", "batch=*")))
    base = os.path.join(index_dir, "segments")
    all_stats = [load_stats(d) for d in sub_dirs]
    pos_flags = {bool(s.get("positions")) for s in all_stats}
    if os.path.isdir(base):
        pos_flags.add(bool(load_stats(index_dir).get("positions")))
    if len(pos_flags) > 1:
        raise ValueError(
            "reconcile_stream: sub-indexes mix positional and "
            "non-positional layouts — rebuild the appends with a "
            "consistent IndexConfig.positions")
    if os.path.isdir(base):
        all_stats.append(load_stats(index_dir))
    n_docs = sum(s["n_docs"] for s in all_stats)
    dl_sums = {f: sum(s["dl_sums"][f] for s in all_stats) for f in (0, 1)}
    # append high-water mark: the source's ingest manifest knows the true
    # next free id (batch bases + sizes); fall back to the base ceiling
    ingest_m = mf.read_global(index_dir, "ingest.json")
    base_stats = load_stats(index_dir) if os.path.isdir(base) else None
    ceiling = max(
        int(ingest_m["next_doc_id"]) if ingest_m else 0,
        int(base_stats.get("doc_id_ceiling", base_stats["n_docs"]))
        if base_stats else 0,
        n_docs)
    stats = {
        "n_docs": n_docs,
        "avgdl": {f: dl_sums[f] / n_docs for f in (0, 1)},
        "dl_sums": dl_sums,
        "segment_docs": all_stats[0].get("segment_docs", cfg.segment_docs),
        "block_size": cfg.block_size,
        "config_hash": mf.config_hash((cfg, "v1")),
        "positions": pos_flags.pop() if pos_flags else False,
        "doc_id_ceiling": ceiling,
    }
    paths = [os.path.join(d, "segments") for d in sub_dirs]
    if os.path.isdir(base):
        paths.insert(0, base)
    # one read per sub-index, unioned: a single multi-path read trips
    # Spark's partition discovery on the differing batch= parent dirs
    parts = [spark.read.parquet(p).drop("shard") for p in paths]
    postings = parts[0]
    for p in parts[1:]:
        postings = postings.unionByName(p)
    postings = postings.withColumn("new_segment", F.col("segment"))
    # global df: per-segment posting counts sum to the global doc frequency
    gdf = (postings.groupBy("term", "field")
           .agg(F.sum("n_postings").alias("gdf")))
    postings = (postings.drop("df")
                .join(gdf, ["term", "field"])
                .withColumnRenamed("gdf", "df"))
    out = _merge_write(spark, postings, stats, out_dir, cfg,
                       lineage={"reconciled_from": index_dir,
                                "n_sub_indexes": len(all_stats)},
                       segment_docs=stats["segment_docs"],
                       n_shards=n_shards, resume=resume)
    # the doc-map union rides into the reconciled version (base + every
    # batch sidecar); attribute postings do NOT — streamed sub-indexes
    # carry none, so a reconciled index advertises attrs=[] and filtered
    # search correctly demands a rebuild with attrs
    dm_paths = [p for p in ([os.path.join(index_dir, "docmap")]
                            + [os.path.join(d, "docmap") for d in sub_dirs])
                if os.path.isdir(p)]
    if dm_paths:
        parts_dm = [spark.read.parquet(p) for p in dm_paths]
        dm = parts_dm[0]
        for q in parts_dm[1:]:
            dm = dm.unionByName(q, allowMissingColumns=True)
        tmp = os.path.join(out_dir, "_tmp_docmap")
        shutil.rmtree(tmp, ignore_errors=True)
        dm.write.mode("overwrite").parquet(tmp)
        final = os.path.join(out_dir, "docmap")
        shutil.rmtree(final, ignore_errors=True)
        mf.commit_dataset(tmp, final)
    return out


def _merge_write(spark: SparkSession, postings, stats: dict, out_dir: str,
                 cfg: IndexConfig, lineage: dict, segment_docs: int,
                 n_shards: int = 4, resume: bool = True,
                 purge: bool = False) -> dict:
    avgdl = stats["avgdl"]
    n_docs = stats["n_docs"]

    key = ["term", "field", "new_segment"]

    positional = bool(stats.get("positions"))

    def encode_block(pdf: pd.DataFrame) -> pd.DataFrame:
        """Vectorized group iteration: numpy change-point detection over
        the sorted keys + positional slices of column arrays — pandas
        ``groupby``/``itertuples``/``iloc`` over ~10^5 tiny groups cost
        more than the decode+encode itself (profiled: ~70% of kernel time
        before this rewrite; same finding as build._encode_partition)."""
        terms = pdf["term"].to_numpy()
        fields = pdf["field"].to_numpy()
        segs = pdf["new_segment"].to_numpy()
        dfs = pdf["df"].to_numpy()
        n = len(pdf)
        # all rows of the batch decode in ONE vectorized codec pass
        # (row-at-a-time decode costs ~0.2 ms/row in numpy call overhead)
        d_f, t_f, l_f, counts = decode_postings_batch(
            pdf["docs_vb"].tolist(), pdf["tfs_vb"].tolist(), pdf["dls_vb"].tolist())
        offs = np.concatenate(([0], np.cumsum(counts)))
        pos_bufs = pdf["pos_vb"].tolist() if positional else None
        change = np.flatnonzero(
            (terms[1:] != terms[:-1]) | (fields[1:] != fields[:-1])
            | (segs[1:] != segs[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [n]))
        cols = ["term", "field", "segment", "df", "n_postings",
                "docs_vb", "tfs_vb", "dls_vb", "block_max",
                "block_last", "max_contrib"]
        if positional:
            cols.append("pos_vb")
        out = {k: [] for k in cols}
        del_col = pdf["del_ids"] if purge else None
        # merged per-group arrays for the deferred cross-group encode
        g_docs: list = []
        g_tfs: list = []
        g_dls: list = []
        for s, e in zip(starts, ends):
            parts = []
            for i in range(s, e):
                d = d_f[offs[i]:offs[i + 1]]
                t = t_f[offs[i]:offs[i + 1]]
                dl = l_f[offs[i]:offs[i + 1]]
                pos = (decode_positions(pos_bufs[i], t)
                       if positional else None)
                if purge:
                    dele = del_col.iloc[i]
                    if dele is not None and len(dele):
                        keep = ~np.isin(
                            d, np.asarray(dele, dtype=np.int64))
                        if not keep.all():
                            if positional:
                                # positions are per-doc runs of length tf
                                pos = pos[np.repeat(keep, t.astype(np.int64))]
                            d, t, dl = d[keep], t[keep], dl[keep]
                if len(d):
                    parts.append((d, t, dl, pos))
            if not parts:
                continue  # every posting of the group was tombstoned
            # sub-lists cover disjoint doc ranges but may share a segment
            # id (e.g. streamed batches meeting at a segment boundary) —
            # order by each part's first doc id so the concatenation stays
            # sorted (the within-partition sort on source ``segment``
            # already orders the common case)
            if e - s > 1:
                parts.sort(key=lambda p: int(p[0][0]))
            field = int(fields[s])
            tfs_cat = parts[0][1] if len(parts) == 1 else \
                np.concatenate([p[1] for p in parts])
            if not positional:
                # defer to the cross-group vectorized encoder (r6):
                # assemble the merged arrays here, encode everything below
                g_docs.append(parts[0][0] if len(parts) == 1
                              else np.concatenate([p[0] for p in parts]))
                g_tfs.append(tfs_cat)
                g_dls.append(parts[0][2] if len(parts) == 1
                             else np.concatenate([p[2] for p in parts]))
                out["term"].append(terms[s])
                out["field"].append(field)
                out["segment"].append(int(segs[s]))
                out["df"].append(int(dfs[s]))
                continue
            enc = encode_postings(
                np.concatenate([p[0] for p in parts]),
                tfs_cat,
                np.concatenate([p[2] for p in parts]),
                idf=idf_fn(n_docs, int(dfs[s])),
                avgdl=avgdl[field], p=cfg.bm25, block_size=cfg.block_size)
            # positions ride along in the same part order (doc asc),
            # re-delta-coded against the merged per-doc boundaries
            out["pos_vb"].append(encode_positions(
                np.concatenate([p[3] for p in parts]), tfs_cat))
            out["term"].append(terms[s])
            out["field"].append(field)
            out["segment"].append(int(segs[s]))
            out["df"].append(int(dfs[s]))
            out["n_postings"].append(enc["n_postings"])
            out["docs_vb"].append(enc["docs_vb"])
            out["tfs_vb"].append(enc["tfs_vb"])
            out["dls_vb"].append(enc["dls_vb"])
            out["block_max"].append(enc["block_max"])
            out["block_last"].append(enc["block_last"])
            out["max_contrib"].append(enc["max_contrib"])
        if not positional and out["term"]:
            counts2 = np.array([len(x) for x in g_docs], dtype=np.int64)
            ends2 = np.cumsum(counts2)
            starts2 = ends2 - counts2
            multi = encode_postings_multi(
                np.concatenate(g_docs), np.concatenate(g_tfs),
                np.concatenate(g_dls), starts2, ends2,
                np.array([idf_fn(n_docs, int(x)) for x in out["df"]]),
                np.array([avgdl[int(f)] for f in out["field"]]),
                cfg.bm25, cfg.block_size)
            out["n_postings"] = multi["n_postings"]
            out["docs_vb"] = multi["docs_vb"]
            out["tfs_vb"] = multi["tfs_vb"]
            out["dls_vb"] = multi["dls_vb"]
            out["block_max"] = multi["block_max"]
            out["block_last"] = multi["block_last"]
            out["max_contrib"] = multi["max_contrib"]
        return pd.DataFrame(out)

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
                res = encode_block(body)
                # a purge can tombstone every group of a batch; an empty
                # frame's default dtypes break Arrow's array<double> column
                if len(res):
                    yield res
        if carry is not None and not carry.empty:
            res = encode_block(carry)
            if len(res):
                yield res

    # shard-grained commit, mirroring build_index (round-5 item #4): the
    # merge config-hash covers cfg AND the lineage descriptor, so a resume
    # only ever skips shards committed by the SAME merge (same source,
    # same factor/sub-index set) — a different merge into the same dir
    # re-encodes everything.
    ch = mf.config_hash((cfg, lineage, segment_docs, n_shards, "merge-v1"))
    os.makedirs(out_dir, exist_ok=True)
    new_stats = dict(stats)
    new_stats["segment_docs"] = segment_docs
    # blocks are re-encoded with cfg.block_size — never carry the source
    # index's stride forward (stale stride => wrong block_max/block_last
    # indexing in wand_topk)
    new_stats["block_size"] = cfg.block_size
    new_stats["avgdl"] = {str(k): v for k, v in avgdl.items()}
    if "dl_sums" in new_stats:
        new_stats["dl_sums"] = {str(k): v for k, v in new_stats["dl_sums"].items()}
    mf.write_global(out_dir, "stats.json", new_stats)

    done = mf.completed_shards(out_dir, ch) if resume else set()
    todo = [s for s in range(n_shards) if s not in done]
    payloads: dict[int, dict] = {
        s: dict(mf.read_shard_manifest(out_dir, s) or {"shard": s}, skipped=True)
        for s in done}
    if todo:
        pending = postings
        if len(todo) < n_shards:
            pending = pending.filter(
                (F.col("new_segment") % n_shards).isin([int(s) for s in todo]))
        merged = (pending
                  .repartition(cfg.n_term_partitions, "term", "field", "new_segment")
                  .sortWithinPartitions("term", "field", "new_segment", "segment")
                  .mapInPandas(kernel,
                               POSTINGS_SCHEMA_POS if positional
                               else POSTINGS_SCHEMA)
                  .withColumn("shard", (F.col("segment") % n_shards).cast("int")))
        tmp_root = os.path.join(out_dir, "_tmp", "merge")
        shutil.rmtree(tmp_root, ignore_errors=True)
        merged.write.mode("overwrite").partitionBy("shard").parquet(tmp_root)
        # row count from parquet footers — no extra Spark job (same as the
        # build's per-shard commit accounting); each shard then commits
        # atomically (tmp → rename) with its own manifest, so a kill
        # mid-loop leaves earlier shards committed and later ones absent —
        # exactly the resume contract the build already has
        import pyarrow.parquet as pq
        for shard in todo:
            tmp = os.path.join(tmp_root, f"shard={shard}")
            os.makedirs(tmp, exist_ok=True)  # shard may be empty of terms
            files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
            n_rows = sum(pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
                         for f in files)
            mf.commit_dataset(tmp, os.path.join(out_dir, "segments", f"shard={shard}"))
            payloads[shard] = {
                "shard": shard, "status": "committed", "config_hash": ch,
                "posting_rows": n_rows, "files": sorted(files),
                "lineage": dict(lineage, filter=f"new_segment % {n_shards} == {shard}"),
            }
            mf.write_shard_manifest(out_dir, shard, payloads[shard])
    shutil.rmtree(os.path.join(out_dir, "_tmp"), ignore_errors=True)
    total_rows = sum(int(payloads[s].get("posting_rows", 0)) for s in payloads)
    return {"posting_rows": total_rows, "lineage": lineage,
            "shards": [payloads[s] for s in sorted(payloads)]}
