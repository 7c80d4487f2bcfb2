"""Exact BM25 top-k as a pure DataFrame plan (no compressed index).

This is SURVEY.md §7 step 3 — the minimum end-to-end slice and the built-in
(non-WAND) fallback: docs → token table → broadcast query-terms join →
per-(query, doc) deterministic score fold → window top-k. Everything stays
JVM-side (whole-stage codegen); the only floating-point caveat is JVM
``log`` vs numpy ``log`` (≤1 ulp), which the rank-identity tests treat as a
near-tie tolerance. The production path (query/wand.py) is bit-exact with
the oracle.

Catalyst notes: the query-terms side is tiny → ``F.broadcast`` forces a
broadcast hash join (no shuffle of the token table beyond its groupBy);
the score fold uses ``array_sort`` + ``aggregate`` so float accumulation
order is fixed regardless of shuffle nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dlkp_spark.config import FIELD_KP, BM25Params
from dlkp_spark.index.build import corpus_stats, doclen_table, token_table


def exact_topk(
    docs: DataFrame,
    queries: DataFrame,
    p: BM25Params | None = None,
    k: int | None = None,
    stats: dict | None = None,
    conjunctive: bool = False,
    min_match: int | None = None,
    doc_filter=None,
) -> DataFrame:
    """docs(doc_id, tokens, keyphrases) × queries(query_id, term)
    → (query_id, rank, doc_id, score), rank 1..k per query.

    ``conjunctive=True`` gives AND semantics: only docs containing EVERY
    query term (in any field) are ranked; scores are the same BM25 sums.
    ``min_match=m`` is the Lucene-style generalization — docs matching at
    least m distinct query terms rank (m=1 is the default OR, m=#terms is
    conjunctive; conjunctive=True is sugar for the latter). The filter is
    one extra ``countDistinct`` in the existing per-doc aggregation plus a
    broadcast join against per-query term counts — no additional shuffle.

    A ``weight`` column on ``queries`` applies Lucene-style per-term query
    boosts: that term's contribution is multiplied by the weight for that
    query (grouped ``(boost × contrib) × weight``, matching the index
    path's ``"term^w"`` syntax bit-for-bit in expression shape).

    ``doc_filter`` (a boolean Column over docs' columns) restricts
    CANDIDATES, not statistics: idf/avgdl stay full-corpus (Lucene filter
    semantics, and identical to the index path's attribute filters), so it
    applies as a semi-join on the per-doc scores BEFORE rank truncation —
    a filtered-out doc can never occupy a top-k slot.
    """
    p = p or BM25Params()
    k = k or p.k
    # stats fold (r6, guide §1.2/§5): with no precomputed stats, derive
    # (n_docs, per-field avgdl) INSIDE the query plan as a broadcast 1-row
    # aggregate instead of a separate driver collect job — the old
    # corpus_stats() call ran a full tokenize pass + job barrier before the
    # main query even planned (measured 0.5 s + ~0.5 s barrier at sf1.0).
    # Long sums / counts divide identically in JVM double arithmetic and
    # Python (both IEEE-754 on < 2^53 ints), so scores are bit-unchanged.
    fold_stats = stats is None
    if not fold_stats:
        n_docs = stats["n_docs"]

    tokens = token_table(docs)
    # broadcast the query terms FIRST: the full-table (tokens ⋈ df) join
    # would shuffle every token row; joining the tiny query side up front
    # prunes to query-term rows before any wide shuffle. df for those terms
    # comes from a count window over the same partitioning — one shuffle,
    # one pass, no cache to leak.
    weighted = "weight" in queries.columns
    cols = ["query_id", "term"] + (["weight"] if weighted else [])
    q = queries.select(*cols).distinct()
    q_terms = q.select("term").distinct()
    term_rows = tokens.join(F.broadcast(q_terms), "term")
    w_df = Window.partitionBy("field", "term")
    hits = (term_rows.withColumn("df", F.count(F.lit(1)).over(w_df))
            .join(F.broadcast(q), "term"))

    if fold_stats:
        fb, fk = F.col("field") == F.lit(0), F.col("field") == F.lit(FIELD_KP)
        srow = (doclen_table(docs).groupBy().agg(
            F.sum(F.when(fb, F.col("dl"))).alias("_dl0"),
            F.count(F.when(fb, F.lit(1))).alias("_n"),
            F.sum(F.when(fk, F.col("dl"))).alias("_dl1")))
        hits = hits.crossJoin(F.broadcast(srow))
        n_docs_c = F.col("_n").cast("double")
        avgdl = F.when(F.col("field") == FIELD_KP,
                       F.col("_dl1").cast("double") / n_docs_c) \
                 .otherwise(F.col("_dl0").cast("double") / n_docs_c)
    else:
        n_docs_c = F.lit(float(stats["n_docs"]))
        avgdl = F.when(F.col("field") == FIELD_KP, F.lit(stats["avgdl"][FIELD_KP])) \
                 .otherwise(F.lit(stats["avgdl"][0]))
    boost = F.when(F.col("field") == FIELD_KP, F.lit(p.kp_boost)).otherwise(F.lit(1.0))
    idf = F.log(F.lit(1.0) + (n_docs_c - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    tf_norm = (tfd * F.lit(p.k1 + 1.0)) / (
        tfd + F.lit(p.k1) * (F.lit(1.0 - p.b) + F.lit(p.b) * dld / avgdl))
    contrib = boost * (idf * tf_norm)
    if weighted:
        # (boost × contrib) × weight — the index path's exact grouping
        contrib = contrib * F.col("weight")

    score_agg = F.aggregate(
        F.array_sort(F.collect_list("c")),
        F.lit(0.0),
        lambda acc, x: acc + x["contrib"]).alias("score")
    scored = hits.select("query_id", "doc_id", "term",
                         F.struct(F.col("term"), F.col("field"),
                                  contrib.alias("contrib")).alias("c"))
    if conjunctive or (min_match is not None and min_match > 1):
        # match-count filter inside the SAME per-doc aggregation
        # (countDistinct adds an Expand to this agg, not a new shuffle),
        # then a broadcast join against the tiny per-query term counts
        per_doc = (scored.groupBy("query_id", "doc_id")
                   .agg(score_agg, F.countDistinct("term").alias("n_matched")))
        qn = q.groupBy("query_id").agg(F.countDistinct("term").alias("n_terms"))
        required = F.col("n_terms") if conjunctive \
            else F.least(F.lit(int(min_match)), F.col("n_terms"))
        per_doc = (per_doc.join(F.broadcast(qn), "query_id")
                   .filter(F.col("n_matched") >= required))
    else:
        per_doc = scored.groupBy("query_id", "doc_id").agg(score_agg)
    per_doc = per_doc.select("query_id", "doc_id", "score")
    if doc_filter is not None:
        per_doc = per_doc.join(
            docs.filter(doc_filter).select("doc_id"), "doc_id", "left_semi")

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (per_doc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score"))
