"""Keyphrase *generation* stand-in — the KG half of the reference (M14/O3).

Reimplements the observable behavior of the reference generation path
(/root/reference/src/dlkp/generation/generator.py:42-89 — beam-search
``model.generate`` with ``num_beams``/``num_return_sequences`` — and the
``[KP_SEP]``-joined decode at
/root/reference/src/dlkp/train_eval_kp_gen.py and
datasets/generation.py: targets are keyphrases joined by the KP_SEP
token). No seq2seq model exists in this environment, so the beam search
over a learned distribution is replaced by a deterministic candidate
scorer with the same *query shape*: per document, enumerate candidate
phrases, score them, keep the top-``k`` sequences (O3 top-k truncation),
and decode to a single ``[KP_SEP]``-joined string exactly like the
reference's post-processing.

Everything is built from JVM-side DataFrame ops (explode, window top-k,
ordered string_agg) — one doc-keyed shuffle + one window pass; scales the
same way topk_orders_per_cust does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KP_SEP = "[KP_SEP]"


def candidate_bigrams(docs: DataFrame, seeds: list[str],
                      tokens_col: str = "tokens", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, kp, n_occ) — seed-anchored bigram candidates per document."""
    toks = F.col(tokens_col)
    bigrams = F.when(F.size(toks) >= 2, F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )).otherwise(F.array().cast("array<string>"))
    return (docs.select(F.col(id_col).alias("doc_id"), F.explode(bigrams).alias("kp"))
            .filter(F.split("kp", " ")[0].isin(seeds))
            .groupBy("doc_id", "kp").agg(F.count(F.lit(1)).alias("n_occ")))


def generate_topk(docs: DataFrame, seeds: list[str], k: int = 3,
                  tokens_col: str = "tokens", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, generated, n_kps) — top-``k`` candidate phrases per doc by
    (score desc, phrase asc), decoded to one ``[KP_SEP]``-joined string.

    The (deterministic) score is the in-document occurrence count — the
    stand-in for the beam's sequence log-probability; the top-k window +
    ordered join mirror ``num_return_sequences=k`` + KP_SEP decode.
    """
    cands = candidate_bigrams(docs, seeds, tokens_col, id_col)
    w = Window.partitionBy("doc_id").orderBy(F.col("n_occ").desc(), "kp")
    top = cands.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    ordered = (top.groupBy("doc_id")
               .agg(F.array_sort(F.collect_list(F.struct(F.col("rn"), F.col("kp"))))
                    .alias("a")))
    return ordered.select(
        "doc_id",
        F.array_join(F.transform("a", lambda s: s["kp"]), f" {KP_SEP} ").alias("generated"),
        F.size("a").alias("n_kps"))
