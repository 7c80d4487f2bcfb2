"""Benchmark decontamination: word n-gram overlap against an eval set.

Standard practice for large-scale training corpora (the GPT-3 paper's
13-gram filter, Brown et al. 2020 §C, and the open reproductions of it):
a training document is *contaminated* when it shares at least one exact
word n-gram with any document of an evaluation/benchmark suite, and is
dropped or flagged before training. The reference repo has no analog
(its corpora are pre-cleaned keyphrase datasets); this operator exists
for the engine's training-data pipeline surface.

100-TB shape: benchmark suites are tiny next to the corpus (MBs vs TBs),
so the eval side reduces to a DISTINCT n-gram set that BROADCASTS; the
corpus side is one scan-local flatMap (split → slide → explode) feeding
a partial-aggregated groupBy on doc_id — the corpus itself is never
shuffled, only its matched (doc_id, gram) pairs, which contamination
sparsity keeps small. For eval sets too big to broadcast, pass
``broadcast_eval=False`` to fall back to a shuffle join on the gram key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPLIT = r"\s+"


def word_ngrams(text: Column, n: int, split_pattern: str = _SPLIT) -> Column:
    """array<string> of space-joined word ``n``-grams of ``text``.

    Pure built-ins, so the whole construction stays JVM-side inside the
    scan stage. Texts with fewer than ``n`` words yield an empty array —
    the ``when`` guard matters because ``sequence(1, 0)`` would DESCEND
    ([1, 0]), not return empty.

    Shape notes (r6, guide §2.3): the token array is bound ONCE via a
    1-element-array ``transform`` (a let-expression Catalyst lacks —
    otherwise every sub-expression re-runs the split per gram), and each
    gram is ``concat_ws`` of ``n`` element accesses instead of
    ``slice``+``array_join`` (no per-gram subarray allocation). Measured
    2.25 s → 0.44 s for the sf1.0 gram stream; output bit-identical.
    """
    toks = F.filter(F.split(text, split_pattern), lambda x: x != F.lit(""))
    return F.get(F.transform(F.array(toks),
                             lambda ts: ngrams_of_tokens(ts, n)), 0)


def ngrams_of_tokens(ts: Column, n: int) -> Column:
    """Space-joined ``n``-grams of an already-bound token array column —
    for callers that let-bind the tokens themselves (repetition_stats)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ts) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.get(ts, i - 1 + j) for j in range(n)]))
    return F.when(F.size(ts) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def ngram_contamination(docs: DataFrame, eval_docs: DataFrame, n: int = 13,
                        text_col: str = "text", id_col: str = "doc_id",
                        broadcast_eval: bool = True) -> DataFrame:
    """(id_col, shared_ngrams) for every doc sharing ≥1 distinct word
    ``n``-gram with any row of ``eval_docs`` — docs with zero overlap are
    absent (left-anti-join against this result = the clean corpus, see
    :func:`decontaminate`). ``shared_ngrams`` counts the doc's DISTINCT
    contaminated n-grams, a useful severity signal (1 shared 13-gram is
    usually boilerplate; hundreds is a verbatim benchmark copy).
    """
    from dlkp_spark.pipeline.util import spread

    doc_grams = spread(docs.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"))
    eval_grams = (eval_docs.select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"))
        .distinct())
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (doc_grams.join(eval_grams, "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("shared_ngrams")))


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  broadcast_eval: bool = True) -> DataFrame:
    """``docs`` minus every row flagged by :func:`ngram_contamination`
    (≥1 shared n-gram ⇒ dropped), schema-preserving. The flag side
    carries only (id, count) rows for contaminated ids, so the anti-join
    stays proportional to contamination, not corpus size.
    """
    flagged = ngram_contamination(docs, eval_docs, n, text_col, id_col,
                                  broadcast_eval).select(id_col)
    # no forced broadcast here: the flagged side is proportional to the
    # CONTAMINATION, which is usually tiny but adversarially unbounded —
    # AQE converts the anti-join to broadcast when it measures small
    return docs.join(flagged, id_col, "left_anti")
