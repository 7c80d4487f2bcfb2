#!/usr/bin/env python
"""Extra benchmarks + plan capture for the optimization rounds.

NOT the driver bench (bench.py is frozen for measurement) — this harness:

- times individual contract queries in isolation with the noop sink
  (guide §1.4: ``df.write.format("noop")`` computes every column of every
  row without sink cost, and unlike ``count()`` cannot be column-pruned),
  AND with ``count()`` (the frozen bench's methodology), labelled per
  query via ``setJobDescription``;
- captures ``explain("formatted")`` plans into ``plans/r06/<q>_after.txt``
  so plan claims in OPTIMIZATION_r06.md are checkable without running
  Spark.

Usage:
  SPARK_GRAFT_SF_DIR=... python bench_extra.py time  q1 q2 ...
  SPARK_GRAFT_SF_DIR=... python bench_extra.py plans q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def _spark():
    from dlkp_spark.session import get_spark

    return get_spark("bench_extra", master=f"local[{CPUS}]",
                     shuffle_partitions=CPUS)


def time_queries(names: list[str], n: int = 4) -> None:
    from dlkp_spark import contract
    from dlkp_spark.cache import release_cached

    spark = _spark()
    for name in names:
        fn, _ = contract.QUERIES[name]
        fn(spark, SF_DIR).count()  # warm
        release_cached()
        spark.catalog.clearCache()
        for label, action in (
                ("count", lambda df: df.count()),
                ("noop", lambda df: df.write.format("noop")
                    .mode("overwrite").save())):
            spark.sparkContext.setJobDescription(f"{name} [{label}]")
            best = None
            for _ in range(n):
                t0 = time.perf_counter()
                action(fn(spark, SF_DIR))
                dt = time.perf_counter() - t0
                release_cached()
                spark.catalog.clearCache()
                best = dt if best is None else min(best, dt)
            print(f"{name:24s} {label:5s} best-of-{n}: {best:.3f}s")
        spark.sparkContext.setJobDescription(None)
    spark.stop()


def capture_plans(names: list[str], suffix: str = "after") -> None:
    from dlkp_spark import contract

    spark = _spark()
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        fn, _ = contract.QUERIES[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    if mode == "plans":
        capture_plans(names)
    else:
        time_queries(names)
