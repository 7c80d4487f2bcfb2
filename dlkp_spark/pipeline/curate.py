"""End-to-end corpus curation: the composed training-data pipeline.

One declarative flow from a raw documents table to a training-ready
kept-set — the chain a 100 TB pretraining corpus actually runs, built
entirely from this package's operators so every stage shares one
Catalyst plan where possible:

  1. language gate         (textstats.langid — built-ins, one scan)
  2. quality gate          (textstats.quality_features thresholds)
  3. exact dedup keeper    (dedup.exact_dedup — md5 hash-groupBy)
  4. near-dup cluster keeper (cluster.dedup_clusters over
     n-gram-Jaccard pairs — transitively-connected docs collapse to
     the min-id member)
  5. stratified downsample (sampling.stratified_sample — RNG-free)

Every stage is individually oracle-gated by its own contract entry; the
composed `curate_corpus` is gated END-TO-END (contract `curate_corpus`)
so stage-ordering bugs — e.g. sampling before dedup, which changes
which cluster member survives — fail the hash, not just unit tests.

Scale notes: stages 1–2 are scan-local predicates (fused by Catalyst
into one pass, no shuffle); 3 is one uniform-key shuffle; 4 is the
pair-generation cost (bucketed at scale — pass minhash/simhash pairs
instead of exact Jaccard) plus O(diameter) label rounds over the far
smaller duplicate subgraph; 5 is again scan-local. Order matters for
cost too: cheap predicates first shrink what the shuffles see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dlkp_spark.pipeline.cluster import dedup_clusters, keep_canonical
from dlkp_spark.pipeline.dedup import exact_dedup, ngram_jaccard_pairs
from dlkp_spark.pipeline.sampling import stratified_sample


def curate_corpus(docs: DataFrame,
                  languages: tuple[str, ...] = ("en",),
                  min_tokens: int = 5,
                  max_stopword_ratio: float = 0.9,
                  jaccard_threshold: float = 0.3,
                  fractions: dict[str, float] | None = None,
                  default_fraction: float = 1.0,
                  pairs: DataFrame | None = None) -> DataFrame:
    """Raw documents → curated kept rows (same schema as ``docs``).

    ``pairs``: optional near-dup edge frame for stage 4 — at 100 TB pass
    ``minhash_lsh_pairs``/``simhash_pairs`` output; default is exact
    n-gram Jaccard (the oracle-checkable variant).
    """
    # stages 1+2: scan-local WHERE predicates — NOT semi-joins. The gate
    # values are pure expressions of the row, so joining docs against a
    # same-cardinality gate frame would shuffle the full corpus twice for
    # what a Filter does inside the scan stage (plan-tested: zero
    # exchanges before the dedup shuffle).
    from dlkp_spark.pipeline.textstats import (
        langid_expr,
        n_tokens_expr,
        stopword_ratio_expr,
    )

    gated = docs.filter(
        langid_expr().isin(list(languages))
        & (n_tokens_expr() >= min_tokens)
        & (stopword_ratio_expr() <= max_stopword_ratio))
    # stage 3: exact-duplicate keeper (lowest doc_id per md5)
    exact_kept = exact_dedup(gated)
    # stage 4: transitive near-dup keeper
    edge_frame = pairs if pairs is not None else \
        ngram_jaccard_pairs(exact_kept, threshold=jaccard_threshold)
    labels = dedup_clusters(exact_kept, edge_frame)
    canonical = keep_canonical(exact_kept, labels)
    # stage 5: deterministic training-mix downsample
    return stratified_sample(canonical, fractions or {},
                             default=default_fraction)


def curate_webtext(docs: DataFrame,
                   languages: tuple[str, ...] = ("en",),
                   max_dup_word_frac: float = 0.6,
                   nats_threshold: float = 3.40,
                   chunk_tokens: int = 32,
                   overlap: int = 8,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """The MODERN webtext chain (RefinedWeb / Dolma shape), complementing
    :func:`curate_corpus`'s classic one:

      1. language gate              (textstats.langid_expr — scan-local)
      2. Gopher repetition gate     (dup-word fraction ≤ threshold —
                                     same scan-local predicate pass)
      3. PII scrub                  (pii.PII_RULES fold — REWRITES text,
                                     still inside the same projection)
      4. exact dedup keeper         (on the SCRUBBED text — two docs
                                     differing only in redacted PII
                                     collapse, which pre-scrub dedup
                                     would miss; ordering is load-bearing
                                     and the end-to-end oracle hashes it)
      5. bigram-LM perplexity gate  (lm.* — the LM is TRAINED ON THE
                                     SURVIVORS of 1–4, so every upstream
                                     stage shifts every downstream score;
                                     docs with <2 tokens have no score
                                     and drop here)
      6. sliding-window chunking    (sampling.chunk_documents — final
                                     training-ready rows)

    Stages 1–3 fuse into one scan (no shuffle before the dedup hash);
    stage 5 adds the LM's two vocabulary-bounded aggregations + one
    broadcast + one Arrow scoring pass. Returns
    ``(doc_id, chunk_id, n_tokens, chunk_text)``.
    """
    from pyspark.sql import functions as F

    from dlkp_spark.cache import persist as _persist
    from dlkp_spark.pipeline.lm import fit_lm, lm_nats
    from dlkp_spark.pipeline.pii import PII_RULES
    from dlkp_spark.pipeline.sampling import chunk_documents
    from dlkp_spark.pipeline.util import spread

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""))
    stoks = F.split(F.lower(F.col(text_col)), " ")

    # single-tokenize gate (r6, guide §2.3 "don't compute things twice"):
    # the langid marker counts (3 filters over the space-split tokens) and
    # the dup-word fraction (2 uses of the \s+-split tokens) each inlined
    # their own split(lower(text)) — ~5 tokenize passes per row in one
    # Filter. Binding both token arrays once inside a 1-element-array
    # ``exists`` acts as a let-expression Catalyst lacks: the lambda
    # variable is materialized once and every sub-expression reads it
    # (measured 2.98 s → 1.82 s for the gate at sf1.0, identical rows).
    from dlkp_spark.pipeline.textstats import LANG_MARKERS

    def _gate(ts, ws_toks):
        def mc(ws):
            return F.size(F.filter(ws_toks, lambda t: t.isin(*ws)))
        c = {lang: mc(ws) for lang, ws in LANG_MARKERS.items()}
        lang = (F.when((c["en"] >= c["de"]) & (c["en"] >= c["fr"]), "en")
                .when(c["de"] >= c["fr"], "de").otherwise("fr"))
        nn = F.size(ts)
        dup_frac = F.when(
            nn > 0, F.lit(1.0) - F.size(F.array_distinct(ts)) / nn.cast("double")
        ).otherwise(F.lit(0.0))
        return lang.isin(list(languages)) & (dup_frac <= max_dup_word_frac)

    bound = F.array(F.struct(toks.alias("t"), stoks.alias("s")))
    gated = spread(docs.select(id_col, text_col), id_col) \
        .filter(F.exists(bound, lambda p: _gate(p["t"], p["s"])))
    scrub = F.col(text_col)
    for _name, pat, tok in PII_RULES:
        scrub = F.regexp_replace(scrub, pat, tok)
    scrubbed = gated.select(F.col(id_col).alias("doc_id"),
                            scrub.alias("text"))
    # persisted (r6): the LM phase alone drives several actions over the
    # survivors (pair-table materialization, vocab count, model collect)
    # and the final plan reads them twice more (scoring pass + keep
    # join) — without a persist each action re-runs the langid gate, the
    # PII regex chain and the dedup window from the scan (measured ~5×
    # recompute of the whole upstream chain at sf1.0).
    kept = _persist(exact_dedup(scrubbed, text_col="text", id_col="doc_id"))
    # fit_lm (r6): one driver action trains + collects the model (the
    # former train/collect pair ran three jobs over the survivors)
    u, b, vocab = fit_lm(kept)
    scores = lm_nats(kept.sparkSession, kept, u, b, vocab)
    good = kept.join(
        scores.filter(F.col("nats_per_token") <= nats_threshold)
        .select("doc_id"), "doc_id")
    return chunk_documents(good, chunk_tokens=chunk_tokens, overlap=overlap)
