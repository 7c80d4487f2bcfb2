"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf0.01
parquet, compare row count + column names + order-insensitive values
(exact for ints/strings; floats must match to 1e-9 — the driver hashes
values, so both sides round identically inside the queries).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def almost_equal(a, b):
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False, f"col count {ra} vs {rb}"
        for va, vb in zip(ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                if not math.isclose(float(va), float(vb), rel_tol=1e-9, abs_tol=1e-9):
                    return False, f"float {va} vs {vb} in {ra} vs {rb}"
            elif va != vb:
                return False, f"value {va!r} vs {vb!r} in {ra} vs {rb}"
    return True, ""


ORACLE = entry_mod.oracle_sql()
ALL = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, ddb, name):
    sdf = ALL[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    got = normalize([tuple(r) for r in sdf.collect()])
    res = ddb.execute(ORACLE[name])
    duck_cols = [d[0].lower() for d in res.description]
    want = normalize(res.fetchall())
    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} vs {duck_cols}"
    ok, msg = almost_equal(got, want)
    assert ok, f"{name}: {msg} (rows {len(got)} vs {len(want)})"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    sdf = ALL[name](spark, SF_DIR)
    rows = sdf.limit(5).collect()
    assert len(sdf.columns) > 0
    assert rows is not None


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
