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
