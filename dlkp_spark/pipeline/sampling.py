"""Corpus sampling and sequence packing for LLM training-data pipelines.

``stratified_sample``: per-group deterministic downsampling — the corpus
mixing knob (keep 10% of crawl, 100% of curated, ...). Selection is a
pure integer hash of the ROW ID, so it is partition-invariant,
reproducible across runs/clusters, and exactly replayable in ANSI SQL
(the oracle-gate): no rand(), no sampleBy's RNG.

``pack_sequences``: greedy first-fit-decreasing packing of documents
into fixed token-budget bins (sequence packing for transformer
training). Packing is inherently a per-partition imperative fold —
implemented as a sorted mapInPandas kernel with partition-scoped bin
ids; global bin ids never need coordination (partition_id is the high
bits). Invariants (no bin over budget unless a single doc exceeds it,
every doc packed exactly once, determinism for a fixed partitioning)
are pytest-pinned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = 2147483647  # 2^31 - 1, same integer field as textstats.doc_fingerprint


def _id_hash(id_col):
    """Three rounds of (x·a + c) mod (2^31−1): one round has no
    avalanche for ids below ~2^31/a (no modular wrap → hash ≈ id·a,
    catastrophically biased on small corpora); rounds 2–3 wrap every
    value. Max intermediate (P−1)·a < 2^52 — exact in both Spark and
    DuckDB int64, no overflow, no platform hash."""
    x = F.col(id_col) % _P
    x = (x * 1000003 + 12345) % _P
    x = (x * 131071 + 54321) % _P
    return (x * 8191 + 2029) % _P


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      group_col: str = "source", id_col: str = "doc_id",
                      default: float = 0.0) -> DataFrame:
    """Keep each row iff hash(id) < fraction(group) · (2^31-1).

    One scan, no shuffle, no RNG state: the filter pushes into the scan
    and the kept set for a group is a fixed subset — growing a fraction
    strictly grows its sample (nested samples, useful for scaling-law
    runs). Groups absent from ``fractions`` keep ``default`` share.
    """
    thresh = F.lit(int(default * _P))
    for g, frac in sorted(fractions.items()):
        thresh = F.when(F.col(group_col) == g, F.lit(int(frac * _P))) \
            .otherwise(thresh)
    return docs.filter(_id_hash(id_col) < thresh)


def mix_fractions(counts: dict[str, int], weights: dict[str, float],
                  total: float) -> dict[str, float]:
    """Per-source keep fractions realizing a target domain mix.

    ``weights`` are RELATIVE mixing weights (the DoReMi/Pile-style domain
    mix spec); ``total`` is the target corpus size in rows. Source ``s``
    should contribute ``weights[s]/Σweights · total`` rows, so its keep
    fraction is that target over its available count, capped at 1.0
    (an under-represented source can't be upsampled by a filter — callers
    that need oversampling repeat the source upstream). Expression order
    ``(w / wsum) * total / count`` is part of the contract: the SQL
    oracle replays the same float64 ops in the same order, making the
    derived integer thresholds — and therefore the kept row SET —
    bit-identical.
    """
    wsum = float(sum(weights.values()))
    return {s: min(1.0, (weights[s] / wsum) * total / counts[s])
            for s in sorted(weights) if s in counts and counts[s] > 0}


def domain_mix_sample(docs: DataFrame, weights: dict[str, float],
                      total: float, group_col: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic resampling of ``docs`` toward a target domain mix:
    ``weights`` give relative source proportions, ``total`` the target
    row count; rows of sources absent from ``weights`` are dropped.

    Two passes: a per-source count aggregation (collect is O(#sources) —
    bounded by the domain taxonomy, never by corpus size) derives keep
    fractions via :func:`mix_fractions`, then :func:`stratified_sample`
    applies them as one scan-local hash filter — no shuffle touches the
    corpus, and the kept set is nested under any larger ``total`` (grow
    the target, keep a superset — scaling-law-friendly).
    """
    scoped = docs.filter(F.col(group_col).isin(list(weights)))
    counts = {r[group_col]: r["cnt"] for r in
              scoped.groupBy(group_col)
              .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    fracs = mix_fractions(counts, weights, float(total))
    return stratified_sample(scoped, fracs, group_col=group_col,
                             id_col=id_col, default=0.0)


def pack_sequences(docs: DataFrame, budget: int = 2048,
                   len_col: str = "n_tokens",
                   id_col: str = "doc_id",
                   strategy: str = "ffd") -> DataFrame:
    """(bin_id, doc_id, n_tokens, bin_fill) — packing into
    ``budget``-token bins, per partition.

    strategy='ffd' (production): sort within each partition by length
    desc (FFD ≥ 8/9·OPT bin count for classical bin packing), then a
    linear first-fit fold in the Arrow kernel. strategy='nextfit': keep
    the caller's row order and only ever append to the LAST bin — the
    SQL-replayable variant (a recursive CTE can fold it row by row),
    used by the oracle-gated contract entry to hash-check the packer's
    Arrow plumbing end-to-end (the bio_extract gating pattern).

    A doc longer than ``budget`` gets a bin of its own (truncation is
    the tokenizer's job, not the packer's). bin_id = partition_id·2^40 +
    local index — globally unique without any cross-partition
    coordination; at 10^12 docs packing stays fully parallel and the
    only data movement is whatever partitioning the caller chose
    upstream.
    """
    if strategy not in ("ffd", "nextfit"):
        raise ValueError(strategy)
    slim = docs.select(id_col, len_col)
    if strategy == "ffd":
        slim = slim.sortWithinPartitions(F.col(len_col).desc(), id_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        fills: list[int] = []  # bin -> tokens used
        out_bin, out_id, out_len = [], [], []
        # buffer the whole partition (slim 2-column rows) and emit once:
        # bin_fill must be each bin's FINAL fill, and later Arrow batches
        # keep adding to bins opened by earlier ones
        for pdf in batches:
            for did, n in zip(pdf[id_col], pdf[len_col]):
                n = int(n)
                if strategy == "nextfit":
                    if fills and fills[-1] + n <= budget:
                        b = len(fills) - 1
                        fills[b] += n
                    else:
                        b = len(fills)
                        fills.append(n)
                else:
                    for b, used in enumerate(fills):
                        if used + n <= budget:
                            fills[b] = used + n
                            break
                    else:
                        b = len(fills)
                        fills.append(n)
                out_bin.append((pid << 40) | b)
                out_id.append(int(did))
                out_len.append(n)
        yield pd.DataFrame({"bin_id": out_bin, "doc_id": out_id,
                            "n_tokens": out_len,
                            "bin_fill": [fills[b & ((1 << 40) - 1)]
                                         for b in out_bin]})

    return slim.mapInPandas(
        kernel, "bin_id long, doc_id long, n_tokens long, bin_fill long")


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window document chunking for LLM context preparation:
    split each doc into ``chunk_tokens``-token windows with ``overlap``
    tokens of context carried between consecutive chunks (the standard
    long-document preprocessing step upstream of ``pack_sequences``).

    Chunk i starts at ``i·(chunk_tokens − overlap)``; starts range over
    ``[0, max(n − overlap, 1))`` so a doc never emits a trailing chunk
    that lies entirely inside the previous chunk's overlap tail, docs
    with ``n ≤ overlap`` emit exactly one chunk, and empty docs emit
    none. The final chunk keeps the remainder (may be shorter).

    Scale shape: ONE scan-local projection — ``sequence`` of starts →
    ``transform`` slices → ``posexplode``; no shuffle at any corpus
    size (output ordering is whatever downstream asks for). Returns
    ``(doc_id, chunk_id, n_tokens, chunk_text)``.
    """
    assert 0 <= overlap < chunk_tokens, "need 0 <= overlap < chunk_tokens"
    step = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    # _ts projection + plain transform, NOT the r6 let-binding rewrite:
    # unlike word_ngrams, the shared token array here is a multi-
    # referenced non-cheap projection column, which CollapseProject
    # declines to duplicate — so the split is already evaluated once and
    # the let only adds wrapper eval. A/B'd twice (identical rows,
    # exceptAll both ways empty): first window parity (1.49 vs 1.43 s),
    # second window the let-variant measured 15-20% SLOWER (1.69 vs
    # 2.02 s best-of-6 interleaved at sf1.0) — reverted to this shape.
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_ts"))
    n = F.size("_ts")
    starts = F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)),
                        F.lit(step))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.least(F.lit(chunk_tokens), n - s).alias("n_tokens"),
            F.array_join(F.slice(F.col("_ts"), s + F.lit(1),
                                 F.lit(chunk_tokens)), " ").alias("chunk_text")))
    return (base.filter(n >= 1)
            .select("doc_id", F.posexplode(chunks).alias("chunk_id", "c"))
            .select("doc_id", F.col("chunk_id").cast("long").alias("chunk_id"),
                    F.col("c.n_tokens").cast("long").alias("n_tokens"),
                    F.col("c.chunk_text").alias("chunk_text")))
