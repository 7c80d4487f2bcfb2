"""Near-duplicate clustering: connected components over a dup-pair graph.

The missing last step of every dedup pipeline (exact / MinHash / SimHash /
embedding pairs all emit EDGES): group transitively-connected documents
into clusters and pick one deterministic keeper per cluster. cluster_id =
the minimum doc id reachable in the component — the same "first wins"
canonicalization the reference's keyphrase dedup applies to surface
strings (datasets/extraction.py:361-375), lifted to the corpus level.

Algorithm: iterative min-label propagation (Pregel-style), expressed as
DataFrame joins — labels converge to the component minimum in
O(component diameter) rounds. Near-dup clusters in web corpora are
shallow (dups of a page cluster around it, diameters of a few hops), so
rounds stay single-digit at any corpus size; each round is ONE
shuffle-join keyed on doc id plus a min-aggregation, both uniform-key.
The driver loop carries only a convergence scalar per round — no vertex
data ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", max_rounds: int = 25) -> DataFrame:
    """(doc_id, cluster_id) for EVERY doc in ``docs`` — singletons map to
    themselves; connected docs share the component-minimum doc id.

    ``pairs`` carries near-dup edges (a, b) from any pair generator
    (ngram_jaccard_pairs / minhash_lsh_pairs / simhash_pairs /
    embedding_cosine_pairs). Deterministic for any edge set.
    """
    verts = docs.select(F.col(id_col).alias("doc_id")).distinct()
    edges = (pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(pairs.select(F.col("b").alias("src"),
                                       F.col("a").alias("dst")))
             .distinct())
    labels = verts.withColumn("cluster_id", F.col("doc_id"))
    for _ in range(max_rounds):
        # each vertex adopts min(own label, neighbors' labels).
        # localCheckpoint (NOT persist) after each round: every round
        # references the previous labels twice, so without lineage
        # truncation the logical plan doubles per round and Catalyst
        # analysis time goes exponential — the standard iterative-
        # DataFrame pitfall. On a cluster swap in reliable checkpoint()
        # for executor-loss tolerance; the cut is the same.
        from_nbrs = (edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
                     .groupBy(F.col("dst").alias("doc_id"))
                     .agg(F.min("cluster_id").alias("nbr_min")))
        new_labels = (labels.join(from_nbrs, "doc_id", "left")
                      .select("doc_id",
                              F.least("cluster_id",
                                      F.coalesce("nbr_min", "cluster_id"))
                               .alias("cluster_id"))
                      .localCheckpoint())
        changed = (new_labels.join(labels.withColumnRenamed("cluster_id", "old"),
                                   "doc_id")
                   .filter(F.col("cluster_id") != F.col("old")).count())
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds — "
            "component diameter exceeds the bound; raise max_rounds")
    return labels


def cluster_stats(labels: DataFrame) -> DataFrame:
    """(n_docs, n_clusters, n_dup_docs, max_cluster) corpus summary."""
    return labels.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        (F.count(F.lit(1)) - F.countDistinct("cluster_id")).alias("n_dup_docs"),
    ).crossJoin(
        labels.groupBy("cluster_id").count()
        .agg(F.max("count").alias("max_cluster")))


def keep_canonical(docs: DataFrame, labels: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Filter ``docs`` to one keeper per cluster — the minimum-id member
    (cluster_id IS that member's id, so this is a semi-join on equality)."""
    keepers = labels.filter(F.col("doc_id") == F.col("cluster_id")) \
        .select(F.col("doc_id").alias(id_col))
    return docs.join(keepers, id_col, "left_semi")
