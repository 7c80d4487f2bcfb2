"""Result snippets: a context window around the most distinctive hit.

Search engines return a text fragment with each hit (Lucene's highlighter
/ unified snippeter). This engine's variant is deterministic and fully
JVM-side so a SQL oracle can replay it bit-for-bit:

- anchor term of a (query, doc) hit = the matched query term with the
  LOWEST document frequency (rarest ⇒ most distinctive; ties break term
  asc) — df read from the index's posting metadata, no blob decode;
- snippet = the ``window`` tokens either side of the anchor's FIRST
  occurrence in the doc's body token stream, space-joined.

The doc text never lives in the posting index (it stays in the source
table, Common-Crawl style), so snippets join the top-k hits BACK to the
docs frame — the hit set is tiny (≤ queries × k), so it broadcasts and
the docs side stays a single scan with no shuffle.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dlkp_spark.config import FIELD_BODY, BM25Params
from dlkp_spark.index.build import load_postings


def snippet_topk(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    p: BM25Params | None = None,
    k: int | None = None,
    window: int = 5,
    **topk_kw,
) -> DataFrame:
    """batch_topk + a snippet per hit.

    → (query_id, rank, doc_id, score, anchor, snippet). ``docs`` must carry
    (doc_id, tokens) — the same frame the index was built from. Extra
    keyword args (filters/deletes/conjunctive/...) pass through to
    ``batch_topk``.
    """
    from dlkp_spark.query.wand import batch_topk

    p = p or BM25Params()
    k = k or p.k
    hits = batch_topk(spark, index_dir, queries, p, k, **topk_kw)

    qmap = [(qid, sorted(set(terms))) for qid, terms in queries]
    all_terms = sorted({t for _, ts in qmap for t in ts})
    # body df per query term from posting METADATA (column-pruned scan of
    # (term, field, df) only, deduped — one tiny driver-side map)
    df_rows = (load_postings(spark, index_dir)
               .filter((F.col("field") == FIELD_BODY)
                       & F.col("term").isin(all_terms))
               .select("term", "df").distinct().collect())
    df_of = {r["term"]: int(r["df"]) for r in df_rows}

    q_df = spark.createDataFrame(
        [(qid, terms) for qid, terms in qmap],
        "query_id long, qterms array<string>")
    if not df_of:
        # none of the query terms exist in the index's body field — no
        # doc can match, so no snippet rows (the anchor expression below
        # would otherwise index into a None map)
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double, "
                "anchor string, snippet string")
    df_map = F.create_map(*chain.from_iterable(
        (F.lit(t), F.lit(df_of[t])) for t in all_terms))

    # hits ≤ |queries| × k → broadcast; docs stays one shuffle-free scan
    enriched = (docs.select("doc_id", "tokens")
                .join(F.broadcast(hits), "doc_id")
                .join(F.broadcast(q_df), "query_id"))
    matched = F.array_intersect(F.array_distinct(F.col("tokens")), F.col("qterms"))
    # rarest matched term, ties term-asc: sort (df, term) structs
    anchor = F.sort_array(F.transform(
        matched, lambda t: F.struct(df_map[t].alias("df"), t.alias("term"))
    ))[0]["term"]
    pos = F.array_position(F.col("tokens"), F.col("anchor"))  # 1-based
    start = F.greatest(F.lit(1), pos - F.lit(window))
    length = F.least(F.size("tokens") + F.lit(1), pos + F.lit(window + 1)) - start
    return (enriched.withColumn("anchor", anchor)
            .withColumn("snippet",
                        F.array_join(F.slice("tokens", start, length), " "))
            .select("query_id", "rank", "doc_id", "score", "anchor", "snippet")
            .orderBy("query_id", "rank"))
