"""Text-analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting. All pure built-in expressions (JVM-side,
whole-stage codegen) so they cost one scan at 100 TB; every formula is
ANSI-SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic per-language marker tokens for the heuristic language ID
LANG_MARKERS = {
    "en": ["the", "and", "of", "data", "query"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "les", "est"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# BPE-ish token pattern: lowercase runs, digit runs, single non-alnum marks
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def langid_expr(text_col: str = "text"):
    """The language-ID prediction as a pure Column expression — usable as
    a scan-local WHERE predicate (curate) or a projection (langid)."""
    toks = F.split(F.lower(F.col(text_col)), " ")

    def marker_count(ws: list[str]):
        # NB: the filter lambda must take exactly one parameter — a second
        # parameter would be bound to the element index by Spark
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    counts = {lang: marker_count(ws) for lang, ws in LANG_MARKERS.items()}
    return (F.when((counts["en"] >= counts["de"]) & (counts["en"] >= counts["fr"]), "en")
            .when(counts["de"] >= counts["fr"], "de")
            .otherwise("fr"))


def langid(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang) — marker-token counting, most hits wins
    (ties broken en > de > fr, deterministic)."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       langid_expr(text_col).alias("pred_lang"))


def n_tokens_expr(text_col: str = "text"):
    return F.size(F.split(F.lower(F.col(text_col)), " "))


def stopword_ratio_expr(text_col: str = "text"):
    toks = F.split(F.lower(F.col(text_col)), " ")
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(sw / F.size(toks).cast("double"), 6)


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: n_tokens, n_chars, avg_token_len,
    stopword_ratio — rounded for oracle comparison."""
    n_tok = n_tokens_expr(text_col)
    n_chars = F.length(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round((n_chars - (n_tok - 1)) / n_tok.cast("double"), 6).alias("avg_token_len"),
        stopword_ratio_expr(text_col).alias("stopword_ratio"),
    )


def token_counts_by(docs: DataFrame, group_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token totals per group."""
    ws = F.size(F.split(F.lower(F.col(text_col)), " "))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), 0))
    return (docs.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(ws).alias("ws_tokens"),
                 F.sum(bpe).alias("bpe_tokens")))


def _run_length_stats(arr):
    """struct(best, singles) over an array: the highest multiplicity of
    any element and the number of elements occurring exactly once —
    computed as max/count of runs in the SORTED array, one
    O(d log d + d) ``aggregate`` fold, entirely scan-local.

    This is the 100-TB shape for per-document frequency stats: the naive
    explode → groupBy(doc, gram) → count would shuffle the corpus's
    whole gram stream to answer a question each row can answer about
    itself. State: (prev element, current run length, best run, closed
    singleton runs); the finish lambda closes the trailing run.
    """
    sorted_a = F.array_sort(arr)
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("run"), F.lit(0).alias("best"),
                    F.lit(0).alias("singles"))

    def step(acc, x):
        extend = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(extend, acc["run"] + 1).otherwise(F.lit(1))
        singles = F.when(extend, acc["singles"]).otherwise(
            acc["singles"] + F.when(acc["run"] == 1, 1).otherwise(0))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"),
                        singles.alias("singles"))

    def finish(acc):
        return F.struct(
            acc["best"].alias("best"),
            (acc["singles"] + F.when(acc["run"] == 1, 1).otherwise(0))
            .alias("singles"))

    return F.aggregate(sorted_a, init, step, finish)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1, the public MassiveText filter family), word-token variant:

    - ``dup_word_frac``: 1 − distinct words / total words
    - ``top_bigram_frac``: occurrences of the most frequent 2-gram over
      total 2-gram occurrences
    - ``dup_trigram_frac``: fraction of 3-gram occurrences whose gram
      appears more than once in the doc

    Everything is ONE projection of pure built-ins (split, array_sort,
    aggregate folds) — no explode, no shuffle, whole-stage codegen; at
    100 TB this filter costs exactly one corpus scan, like the other
    textstats. Each fraction is a single int/int division rounded to 6
    (the same op in the SQL oracle → bit-stable gate).

    Shape note (r6): kept as a FLAT projection deliberately. A
    let-bound-struct rewrite (one tokenize feeding all four consumers)
    was A/B'd and rejected: per-field struct references re-evaluate the
    struct (no CSE across Project outputs), and the inline()/Generate
    materialization barrier that fixes that also blocks the optimizer
    from pruning this projection under count()-style actions — pure
    column pruning is worth more here than the duplicate tokenize.
    """
    from dlkp_spark.pipeline.decontam import word_ngrams

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""))
    n_tok = F.size(toks)
    bi = _run_length_stats(word_ngrams(F.lower(F.col(text_col)), 2))
    tri = _run_length_stats(word_ngrams(F.lower(F.col(text_col)), 3))
    n_bi = F.greatest(n_tok - 1, F.lit(0))
    n_tri = F.greatest(n_tok - 2, F.lit(0))
    stats = docs.select(
        F.col(id_col).alias("doc_id"), n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        bi.alias("bi"), tri.alias("tri"),
        n_bi.alias("n_bi"), n_tri.alias("n_tri"))
    zero = F.lit(0.0)
    return stats.select(
        "doc_id", stats["n_tokens"].cast("long").alias("n_tokens"),
        F.when(stats["n_tokens"] > 0,
               F.round(F.lit(1.0) - stats["n_distinct"]
                       / stats["n_tokens"].cast("double"), 6))
        .otherwise(zero).alias("dup_word_frac"),
        F.when(stats["n_bi"] > 0,
               F.round(stats["bi"]["best"] / stats["n_bi"].cast("double"), 6))
        .otherwise(zero).alias("top_bigram_frac"),
        F.when(stats["n_tri"] > 0,
               F.round((stats["n_tri"] - stats["tri"]["singles"])
                       / stats["n_tri"].cast("double"), 6))
        .otherwise(zero).alias("dup_trigram_frac"))


FP_MUL = 1000003
FP_MOD = 2147483647


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint) — rolling polynomial hash over tokens.

    token value = length(t)*131 + ascii(first char); acc = (acc*1000003 +
    v) mod (2^31-1). Pure integer built-ins → identical in Spark and
    DuckDB (no float, no platform hash).
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    tok_vals = F.transform(
        toks, lambda t: (F.length(t) * 131 + F.ascii(F.substring(t, 1, 1))).cast("long"))
    fp = F.aggregate(tok_vals, F.lit(0).cast("long"),
                     lambda acc, v: (acc * FP_MUL + v) % FP_MOD)
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


def tfidf_keywords(docs: DataFrame, k: int = 5, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Top-k TF-IDF keywords per document → (doc_id, rank, term, score).

    The unsupervised cousin of the keyphrase tagger: label every document
    with its k most distinctive terms. idf = ln((N+1)/(df+1)) + 1
    (smoothed, sklearn-style), score = tf·idf, ties broken by term.

    Scale shape: explode → ONE map-combined groupBy for per-doc tf
    (shuffle keyed (doc_id, term) — uniform); df is a vocabulary-sized
    second aggregation OF THE TF TABLE (never re-shuffles the corpus);
    the scalar N joins in via a broadcast 1-row frame; the per-doc top-k
    window buffers only one document's vocabulary per key. Ranking
    happens on the raw float64 (libm ln — bit-identical in the DuckDB
    oracle); only the emitted score is rounded.
    """
    from pyspark.sql import Window

    from dlkp_spark.cache import persist as _persist
    from dlkp_spark.pipeline.util import spread

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""))
    # persisted: df and the join both read tf — without it Catalyst
    # re-scans and re-explodes the corpus for the df branch
    tf = _persist(
        spread(docs.select(id_col, text_col), id_col)
        .select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (tf.join(df_, "term").crossJoin(F.broadcast(n))
              .withColumn("score", F.col("tf") * (F.log(
                  (F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                  + F.lit(1.0))))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(),
                                             F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "term",
                    F.round("score", 6).alias("score")))
