"""SparkSession factory with engine defaults.

Local-mode friendly but cluster-shaped: every setting here is also the right
default for a multi-executor cluster run via ``spark-submit --py-files``
(AQE on, Arrow on, UTC, shuffle partitions sized explicitly by the caller).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dlkp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # One Python worker per task slot already saturates the cores — nested
    # OpenMP/BLAS threading inside numpy/pyarrow oversubscribes N_workers ×
    # N_threads and collapses throughput (measured 5× slowdown at 32
    # workers). Pin math libs to one thread per worker; local-mode workers
    # fork from this process so the env propagates, and executorEnv covers
    # cluster mode.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    # Under spark-submit (detected by the Py4J gateway the launcher opens
    # for the driver) the master comes from `spark-submit --master` and must
    # NOT be overridden here — builder.master() wins over submit-time conf,
    # which would silently turn a cluster run into local[32]. Explicit
    # `master=` / SPARK_GRAFT_MASTER still take precedence for callers that
    # want a specific level (tests, scaling bench).
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        None if under_submit else "local[32]")
    # In local[N] mode shuffle partitions default to N (match cores);
    # on a real cluster the caller passes executor-count-aware values.
    if shuffle_partitions is None:
        if master and master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = int(master[6:-1])
        else:
            shuffle_partitions = 32
    b = (
        SparkSession.builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # Long-lived sessions accumulate status-store state per job/stage/
        # SQL execution even with the UI off (bench.py documents a measured
        # 3-5x tax on late queries of a ~500-stage JVM). Bounded retention
        # and a periodic context-cleaner GC keep a many-query session's
        # listener and reference overhead flat; the same caps are sane on a
        # production driver that serves thousands of queries (r6).
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "20000")
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    if master:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
