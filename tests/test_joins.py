"""Skew-salted join: row-identity with the plain join, salt spread."""

import pytest
from pyspark.sql import functions as F

from dlkp_spark.pipeline.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of probe rows) + a long tail
    probe = spark.createDataFrame(
        [(0 if i % 10 else i % 7, i) for i in range(2000)],
        "k long, pid long")
    build = spark.createDataFrame([(i, f"v{i}") for i in range(7)],
                                  "k long, val string")
    return probe, build


def test_salted_join_row_identical_to_plain(spark, skewed):
    probe, build = skewed
    a = sorted(map(tuple, salted_join(probe, build, "k", n_salt=8).collect()))
    b = sorted(map(tuple, probe.join(build, "k").collect()))
    assert a == b and len(a) == 2000


def test_salt_actually_spreads_the_hot_key(spark, skewed):
    probe, _build = skewed
    salted = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]),
                        F.lit(8)).cast("int"))
    spread = (salted.filter("k = 0").groupBy("_salt").count().collect())
    assert len(spread) == 8  # hot key occupies every salt bucket
    counts = [r["count"] for r in spread]
    assert max(counts) < sum(counts)  # no single bucket holds it all


def test_build_preserving_join_types_rejected(spark, skewed):
    """ADVICE r3: right/full would replicate unmatched BUILD rows once per
    salt replica — salted_join must reject them instead of being quietly
    wrong."""
    probe, build = skewed
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="not row-identical"):
            salted_join(probe, build, "k", how=how)


def test_semi_and_anti_row_identical_to_plain(spark, skewed):
    probe, build = skewed
    for how in ("left_semi", "left_anti"):
        a = sorted(map(tuple, salted_join(probe, build, "k", how=how).collect()))
        b = sorted(map(tuple, probe.join(build, "k", how).collect()))
        assert a == b, how


def test_left_join_nulls_preserved(spark):
    probe = spark.createDataFrame([(1, "a"), (9, "b")], "k long, x string")
    build = spark.createDataFrame([(1, "y")], "k long, v string")
    got = sorted(map(tuple, salted_join(probe, build, "k", how="left").collect()))
    assert got == [(1, "a", "y"), (9, "b", None)]
