"""PII redaction for web-scale curation (the RefinedWeb / Dolma scrub
stage): replace emails, IPv4 addresses and phone numbers with typed
placeholder tokens and report per-document match counts.

Everything is pure built-in ``regexp_extract_all`` / ``regexp_replace``
expressions — JVM-side, whole-stage codegen, ONE scan and zero shuffles
at any corpus size. The patterns deliberately use only the regex subset
shared by Java's engine (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b`` — no backreferences or lookaround — so the
oracle replays the exact same matches (DuckDB's ``regexp_replace`` needs
the ``'g'`` flag to match Spark's replace-all default).

Rules apply IN ORDER, each counting against the text as already redacted
by the previous rules (an email's digits can't double-count as a phone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters; see module docstring
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, clean_text) — scan-local.

    Each rule's count expression captures the text AS OF its turn in the
    chain (lazy Column trees), so counting and replacement are
    sequential even though the whole thing compiles to one projection.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, tok in PII_RULES:
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
                      .cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, tok)
    return docs.select(F.col(id_col).alias("doc_id"), *counts,
                       cur.alias("clean_text"))
