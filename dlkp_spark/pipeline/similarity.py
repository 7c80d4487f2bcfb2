"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (pure built-ins:
``zip_with`` dot product folded with ``aggregate``); the scale path is
random-hyperplane LSH bucketing with multiprobe — both deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def with_cosine(embs: DataFrame, query_vec: list[float],
                vec_col: str = "embedding") -> DataFrame:
    """+cosine column vs a constant query vector — all JVM-side.

    The query vector is a literal array (constant-folded by Catalyst);
    dimensions cast to double before any arithmetic.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))
    return embs.withColumn("cosine", cos)


def brute_cosine_topk(embs: DataFrame, query_vec: list[float], k: int = 10,
                      vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine: (rank, vec_id, cosine). Tie-break by id asc.

    Scale shape: ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject — each partition keeps a k-row heap and only k
    rows per partition merge — so the full corpus is never sorted and
    nothing funnels through one partition. Rank assignment then runs a
    window over the surviving ≤k rows only (explicit single-partition key:
    at that size one partition IS the plan, and the constant key documents
    it instead of tripping Spark's no-partition-defined warning).
    """
    scored = with_cosine(embs, query_vec, vec_col)
    top = (scored.select(F.col(id_col).alias("vec_id"), "cosine")
           .orderBy(F.col("cosine").desc(), "vec_id").limit(k))
    # rank the surviving <=k rows without any WindowExec: one partition,
    # in-partition sort, sequential monotonically_increasing_id
    return (top.coalesce(1)
            .sortWithinPartitions(F.col("cosine").desc(), "vec_id")
            .withColumn("rank", (F.monotonically_increasing_id() + 1).cast("int"))
            .select("rank", "vec_id", F.round("cosine", 6).alias("cosine")))


def lsh_planes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def bucket_of(vec: np.ndarray, planes: np.ndarray) -> int:
    bits = (planes @ vec) > 0
    return int(np.packbits(bits[::-1].astype(np.uint8), bitorder="little")
               .view(np.uint16)[0]) if len(bits) == 16 else int(
        sum(1 << i for i, b in enumerate(bits) if b))


def with_lsh_bucket(embs: DataFrame, n_planes: int = 16, seed: int = 42,
                    vec_col: str = "embedding", dim: int | None = None) -> DataFrame:
    """+bucket column: sign-bit hyperplane LSH, computed JVM-side.

    The plane matrix is embedded as literal arrays (small: n_planes × dim
    doubles) — on a cluster it constant-folds into codegen; no Python in
    the scan path. Pass ``dim`` to skip the one-row probe job that
    otherwise discovers the vector dimensionality.
    """
    if dim is None:
        dim = len(embs.select(vec_col).first()[0])
    planes = lsh_planes(dim, n_planes, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0)
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bucket = bucket + F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return embs.withColumn("bucket", bucket)


def write_bucketed(embs: DataFrame, path: str, n_planes: int = 16,
                   seed: int = 42, vec_col: str = "embedding",
                   dim: int | None = None) -> None:
    """Persist the vectors PARTITIONED BY their LSH bucket — the 10^12-row
    layout: a top-k probe then reads only the probed buckets' partitions
    (partition pruning at the file-listing level, no data scan of the
    rest). On Iceberg the bucket column is the partition spec; here it is
    a hive-style parquet partition, same pruning semantics.
    """
    with_lsh_bucket(embs, n_planes, seed, vec_col, dim) \
        .write.mode("overwrite").partitionBy("bucket").parquet(path)


def probed_topk(spark, path: str, query_vec: list[float], k: int = 10,
                n_planes: int = 16, seed: int = 42, multiprobe: int = 1,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN top-k over a bucket-partitioned table: compute the probe set
    driver-side (tiny), filter on the PARTITION column (prunes at file
    listing), brute-force cosine within the survivors."""
    from itertools import combinations

    planes = lsh_planes(len(query_vec), n_planes, seed)
    qb = int(sum(1 << i for i, b in
                 enumerate((planes @ np.asarray(query_vec)) > 0) if b))
    probe = {qb}
    for r in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), r):
            flip = 0
            for i in bits:
                flip |= 1 << i
            probe.add(qb ^ flip)
    bucketed = spark.read.parquet(path).filter(F.col("bucket").isin(sorted(probe)))
    return brute_cosine_topk(bucketed, query_vec, k, vec_col, id_col)


def ivf_centroids(embs: DataFrame, n_centroids: int = 16, seed: int = 42,
                  vec_col: str = "embedding", iters: int = 5,
                  sample_size: int = 4096,
                  sample_fraction: float | None = None) -> np.ndarray:
    """IVF coarse quantizer: k-means on a deterministic sample.

    Distributed shape: TRAIN on a driver-side sample (standard practice —
    IVF training is O(sample), independent of corpus size), ASSIGN
    distributed. The sample is deterministic AND never globally sorts the
    corpus: a hash-threshold filter (``pmod(xxhash64(vec), D) < f·D``,
    content-keyed so it is partitioning-invariant) prunes the scan first
    when ``sample_fraction`` is given (set it to ~4·sample_size/n_rows at
    scale), then ``orderBy(hash, vec).limit(sample_size)`` over the
    survivors — which Catalyst plans as TakeOrderedAndProject (a
    sample_size-row heap per partition + heap merge, no global Sort
    exchange; asserted in tests/test_plans.py). The (hash, vec) composite
    order keeps ties at the limit boundary run-independent; Lloyd
    iterations run in numpy.
    """
    pool = embs.select(vec_col)
    denom = 1 << 20
    hkey = F.pmod(F.xxhash64(F.col(vec_col).cast("array<double>")), F.lit(denom))
    if sample_fraction is not None:
        # strict prefix of the sample order: as long as the fraction keeps
        # >= sample_size rows, the filtered sample is IDENTICAL to the
        # unfiltered one — the filter only prunes rows the limit would
        # discard anyway
        pool = pool.filter(hkey < F.lit(int(sample_fraction * denom)))
    sample = np.array(
        [list(map(float, r[0])) for r in
         pool.orderBy(hkey, F.col(vec_col)).limit(sample_size).collect()],
        dtype=np.float64)
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                              replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def with_ivf_cell(embs: DataFrame, centroids: np.ndarray,
                  vec_col: str = "embedding") -> DataFrame:
    """+cell column: nearest-centroid assignment, vectorized per Arrow batch.

    At 10^12 rows ``cell`` becomes the table's partition column —
    queries prune to n_probe cells instead of scanning the corpus.
    """
    cents = centroids.astype(np.float64)

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            v = np.array([list(map(float, x)) for x in pdf[vec_col]], dtype=np.float64)
            d = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            out = pdf.copy()
            out["cell"] = d.argmin(axis=1).astype(np.int32)
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in embs.schema.fields)
    return embs.mapInPandas(kernel, schema + ", cell int")


def ivf_cosine_topk(embs: DataFrame, query_vec: list[float], k: int = 10,
                    n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF ANN: assign to cells, probe the n_probe nearest cells to the
    query, brute-force cosine within the probed candidates."""
    cents = ivf_centroids(embs, n_centroids, seed, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()[:n_probe]
    cells = [int(c) for c in order]
    cands = with_ivf_cell(embs, cents, vec_col).filter(F.col("cell").isin(cells))
    return brute_cosine_topk(cands.drop("cell"), query_vec, k, vec_col, id_col)


def embedding_cosine_pairs(embs: DataFrame, threshold: float = 0.9,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """Exact embedding-cosine near-dup pairs: (a, b, cosine) with a < b,
    cosine >= threshold. All JVM-side: per-row norm precompute, self-join,
    ``zip_with``/``aggregate`` dot product.

    This exact variant is the oracle-checkable one — O(n²) by design; at
    10^12 rows run :func:`embedding_cosine_pairs_lsh`, which restricts the
    same verify expression to LSH-bucket candidates (identical output when
    the bucket recall covers the threshold — same two-tier design as
    ngram_jaccard_pairs / minhash_lsh_pairs).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = embs.select(F.col(id_col).alias("id"), v.alias("v"),
                    F.sqrt(_dot(v, v)).alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"),
                    F.round("cosine", 6).alias("cosine")))


def embedding_cosine_pairs_lsh(embs: DataFrame, threshold: float = 0.9,
                               n_planes: int = 8, seed: int = 42,
                               vec_col: str = "embedding", id_col: str = "vec_id",
                               max_bucket: int = 4096) -> DataFrame:
    """Scale path for embedding near-dup: hyperplane-LSH bucket the
    vectors, generate candidates only within a bucket, verify with the
    exact cosine. High-cosine pairs agree on most hyperplane signs —
    P[sign flip] = theta/pi per plane — so bucket-equality recall rises
    toward 1 as threshold→1; the knob trade is recall vs join fan-in,
    exactly like minhash banding. One shuffle to bucket, bucket-equi-join
    (never cartesian), window-capped buckets against skew.
    """
    bucketed = with_lsh_bucket(embs, n_planes, seed, vec_col)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = bucketed.select(F.col(id_col).alias("id"), F.col("bucket"),
                        v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm"))
    wn = F.count(F.lit(1)).over(Window.partitionBy("bucket"))
    e = e.withColumn("_n", wn).filter(F.col("_n") <= max_bucket).drop("_n")
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"),
                    F.round("cosine", 6).alias("cosine")))


def lsh_cosine_topk(embs: DataFrame, query_vec: list[float], k: int = 10,
                    n_planes: int = 8, seed: int = 42, multiprobe: int = 1,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN top-k: probe every bucket within hamming-``multiprobe`` of the
    query's bucket, brute-force cosine within candidates.

    Scale shape: the bucket column is a partition key at 10^12 rows
    (write the table partitioned/clustered by bucket → partition pruning
    turns a full scan into reading the probed buckets only; probe count is
    sum_{r<=multiprobe} C(n_planes, r), independent of corpus size).
    """
    from itertools import combinations

    dim = len(query_vec)  # also passed to with_lsh_bucket — no probe job
    planes = lsh_planes(dim, n_planes, seed)
    qb = int(sum(1 << i for i, b in enumerate((planes @ np.asarray(query_vec)) > 0) if b))
    probe = {qb}
    for r in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), r):
            flip = 0
            for i in bits:
                flip |= 1 << i
            probe.add(qb ^ flip)
    bucketed = with_lsh_bucket(embs, n_planes, seed, vec_col, dim=dim)
    cands = bucketed.filter(F.col("bucket").isin(sorted(probe)))
    return brute_cosine_topk(cands, query_vec, k, vec_col, id_col)
