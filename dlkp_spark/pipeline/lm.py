"""CCNet-style n-gram LM quality scoring: train a bigram LM on (a slice
of) the corpus, broadcast it, score every document's per-token negative
log-likelihood in nats. The perplexity bucket filter of Wenzek et al.
2020 (CCNet) — documents whose LM score is far from the reference
distribution are boilerplate or gibberish — expressed Spark-first:

- **training** is two aggregations over the exploded bigram stream
  (context counts + pair counts): a classic reduce whose OUTPUT is
  vocabulary-sized, not corpus-sized, so the shuffle is bounded by the
  (pruned) vocab no matter how big the corpus is;
- **the model** ships via ``SparkContext.broadcast`` (one torrent copy
  per executor, same pattern as analysis/tensor_model.py), after a
  BOUNDED driver collect guarded by ``max_entries`` — prune with
  ``min_count`` to stay within it, exactly how production n-gram LMs
  (KenLM-style) are thresholded;
- **scoring** is one scan-local Arrow pass: per document a pure-Python
  left-to-right fold of ``math.log((c(v,w)+α) / (c(v)+α·V))`` — scalar
  libm ops in document order, which the DuckDB oracle replays exactly
  (``list_reduce`` over ``list(logp ORDER BY position)``; DuckDB's
  ``ln`` is the same libm as Python's ``math.log``). No shuffle touches
  the corpus at scoring time.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dlkp_spark.cache import persist as _persist
from dlkp_spark.pipeline.util import spread

_SPLIT = r"\s+"


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), _SPLIT),
                    lambda x: x != F.lit(""))


def bigram_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(v, w) adjacent-token pairs, one row per occurrence — the training
    stream. ``arrays_zip`` of the two shifted slices keeps the pairing
    scan-local; only the groupBy that counts them shuffles, and that
    shuffle's output is vocabulary-sized."""
    toks = _tokens(text_col)
    zipped = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("v"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w"))
    return (docs.select(F.explode(zipped).alias("p"))
            .select(F.col("p.v").alias("v"), F.col("p.w").alias("w")))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    min_count: int = 1) -> tuple[DataFrame, DataFrame, int]:
    """(uni_df, bi_df, vocab_size): context counts c(v) over the pair
    stream, pair counts c(v, w) with ``c >= min_count``, and the corpus
    vocabulary size V (distinct tokens, all positions). c(v) is counted
    BEFORE pruning so probabilities still sum to ≤1 per context."""
    src = spread(docs.select(text_col))
    pairs = bigram_pairs(src, text_col)
    # ONE corpus scan trains both tables (r6): the unpruned pair counts
    # are persisted (vocabulary²-bounded, small) and c(v) is derived from
    # them as Σ_w c(v, w) — identical counts to grouping the raw pair
    # stream, since every pair occurrence has exactly one context. The
    # former separate uni/bi groupBys re-exploded the corpus per table
    # (and per downstream count/collect action).
    bi_full = _persist(pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c")))
    uni = bi_full.groupBy("v").agg(F.sum("c").alias("c"))
    bi = bi_full.filter(F.col("c") >= min_count)
    vocab = (src.select(F.explode(_tokens(text_col)).alias("t"))
             .agg(F.count_distinct("t").alias("v")).collect()[0]["v"])
    return uni, bi, int(vocab)


def fit_lm(docs: DataFrame, text_col: str = "text", min_count: int = 1,
           max_entries: int = 5_000_000) -> tuple[dict, dict, int]:
    """Train + collect in ONE driver action (r6): the former
    ``train_bigram_lm`` → ``collect_lm`` sequence ran three jobs (uni
    collect, bi collect, vocab count-distinct), each a separate barrier
    over the same persisted pair table. Here the three bounded results
    ride one unioned collect — the pair-table persist materializes inside
    it, the vocab branch scans in parallel with it, and the model reaches
    the driver in a single pass. Counts and vocab are identical to the
    two-step API (same aggregations, same ``min_count`` pruning,
    same ``max_entries`` bound)."""
    src = spread(docs.select(text_col))
    pairs = bigram_pairs(src, text_col)
    bi_full = _persist(pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c")))
    uni = bi_full.groupBy("v").agg(F.sum("c").alias("c"))
    bi = bi_full.filter(F.col("c") >= min_count)
    nul = F.lit(None).cast("string")
    u_part = (uni.limit(max_entries + 1)
              .select("v", nul.alias("w"), "c", F.lit(0).alias("tag")))
    b_part = (bi.limit(max_entries + 1)
              .select("v", "w", "c", F.lit(1).alias("tag")))
    v_part = (src.select(F.explode(_tokens(text_col)).alias("t"))
              .agg(F.count_distinct("t").alias("c"))
              .select(nul.alias("v"), nul.alias("w"), "c", F.lit(2).alias("tag")))
    rows = u_part.unionByName(b_part).unionByName(v_part).collect()
    u = {r["v"]: r["c"] for r in rows if r["tag"] == 0}
    b = {(r["v"], r["w"]): r["c"] for r in rows if r["tag"] == 1}
    vocab = next(int(r["c"]) for r in rows if r["tag"] == 2)
    if len(u) + len(b) > max_entries:
        raise ValueError(
            f"LM has > max_entries={max_entries} rows; "
            f"raise min_count to prune before collecting")
    return u, b, vocab


def collect_lm(uni: DataFrame, bi: DataFrame,
               max_entries: int = 5_000_000) -> tuple[dict, dict]:
    """Driver-side model tables for broadcast. BOUNDED by contract:
    raises if the (pruned) model exceeds ``max_entries`` rows — at that
    point raise ``min_count``, not this limit (same bounded-collect
    discipline as the IVF centroid sample)."""
    # bound enforced with limit(max_entries+1) pushed into the collect
    # itself (r6): within bound, limit returns every row, so the two
    # former count() jobs (each a full re-aggregation pass before
    # train_bigram_lm persisted its table) are folded away; over bound,
    # the driver holds at most max_entries+1 rows before raising.
    u_rows = uni.limit(max_entries + 1).collect()
    b_rows = bi.limit(max_entries + 1).collect()
    if len(u_rows) + len(b_rows) > max_entries:
        raise ValueError(
            f"LM has > max_entries={max_entries} rows; "
            f"raise min_count to prune before collecting")
    u = {r["v"]: r["c"] for r in u_rows}
    b = {(r["v"], r["w"]): r["c"] for r in b_rows}
    return u, b


def lm_nats(spark: SparkSession, docs: DataFrame, uni: dict, bi: dict,
            vocab_size: int, alpha: float = 1.0, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, nats_per_token) for docs with ≥1 bigram.

    nats_per_token = −(Σ_i log p(w_i | w_{i−1})) / n_bigrams with
    add-α smoothing p(w|v) = (c(v,w)+α) / (c(v)+α·V); the sum is a
    LEFT-TO-RIGHT scalar fold in document order (the oracle contract —
    see module docstring), rounded to 6. Higher = more surprising text;
    the CCNet filter buckets on this column.
    """
    bc = spark.sparkContext.broadcast((uni, bi))
    av = float(alpha) * float(vocab_size)
    alpha = float(alpha)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        u, b = bc.value
        for pdf in batches:
            ids, nb, nats = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in str(text).lower().split() if t]
                if len(toks) < 2:
                    continue
                acc = 0.0
                for v, w in zip(toks, toks[1:]):
                    acc = acc + math.log(
                        (b.get((v, w), 0) + alpha) / (u.get(v, 0) + av))
                n = len(toks) - 1
                ids.append(doc_id)
                nb.append(n)
                nats.append(round(-acc / n, 6))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "n_bigrams": pd.Series(nb, dtype="int64"),
                                "nats_per_token": pd.Series(nats, dtype="float64")})

    # spread: the Arrow scoring pass inherits the scan's partitioning —
    # a 1–2 task local scan would serialize the per-token fold that 32
    # Python workers can share; no-op at scale (util.spread docstring)
    return spread(docs.select(id_col, text_col), id_col).mapInPandas(
        score, "doc_id long, n_bigrams long, nats_per_token double")
