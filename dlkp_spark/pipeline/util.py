"""Scale-adaptive parallelism helpers shared by the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` onto the cluster's default parallelism — ONLY
    when the current plan has fewer partitions than that.

    Heavy scan-local operators (shingle hashing, minhash families, LM
    token folds, n-gram explodes) inherit the SCAN's partitioning. A
    small parquet input (one file with one row group — the local
    testdata shape) yields a 1–2 task scan, serializing work 32 cores
    could share: measured 23 s of the 28 s minhash_lsh_pairs wall-clock
    at sf1.0 was the signature projection running on 2 tasks. On a
    100 TB input the scan already has far more partitions than cores, so
    the guard makes this a no-op — the production path stays
    shuffle-free and nothing here is tuned to local[32].

    With key columns: hash-repartition on them (deterministic keys only —
    ids, never rand(); retried tasks must reproduce the same placement,
    SPARK-38388). Without keys: round-robin, safe because Spark sorts
    before round-robin repartition by default.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(k) for k in key_cols])
    return df.repartition(target)
