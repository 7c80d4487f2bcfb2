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
