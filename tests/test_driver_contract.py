"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf0.01
parquet, compare row count + column names + order-insensitive values.

TYPE-STRICT, mirroring the driver's pandas canonicalization: both sides go
through pandas DataFrames (Spark .toPandas(), DuckDB .df()), are sorted by
every column, and compared with dtype *kind* strictness — an int64 column
on one side and float64 on the other FAILS even when the values are
numerically equal (that exact mismatch — DuckDB HUGEINT sum → float64 —
shipped two driver hash-fails in round 1). Floats compare rounded to 9
decimals; ints/strings/bools compare exactly.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

# default = the driver's gate scale; override for scale audits, e.g.
#   CONTRACT_SF_DIR=/root/testdata/sf0.1 pytest tests/test_driver_contract.py
SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.01")
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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: lowercase columns, sort by all."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _kind(dtype) -> str:
    # driver's value hash is over the pandas representation, so the dtype
    # KIND (i vs f vs O/b) must agree; width (int32 vs int64) is tolerated
    k = np.dtype(dtype).kind
    return {"i": "i", "u": "i", "f": "f", "b": "b"}.get(k, "O")


def compare(got: pd.DataFrame, want: pd.DataFrame) -> tuple[bool, str]:
    if list(got.columns) != list(want.columns):
        return False, f"columns {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row count {len(got)} vs {len(want)}"
    for c in got.columns:
        ka, kb = _kind(got[c].dtype), _kind(want[c].dtype)
        if ka != kb:
            return False, (f"dtype kind mismatch in '{c}': spark {got[c].dtype}"
                           f" vs oracle {want[c].dtype} — driver hash WILL diverge")
        a, b = got[c], want[c]
        if ka == "f":
            if not np.allclose(a.to_numpy(float), b.to_numpy(float),
                               rtol=0, atol=5e-10, equal_nan=True):
                bad = (~np.isclose(a.to_numpy(float), b.to_numpy(float),
                                   rtol=0, atol=5e-10, equal_nan=True)).nonzero()[0][:3]
                return False, f"float col '{c}' differs at rows {bad}: {a.iloc[bad].tolist()} vs {b.iloc[bad].tolist()}"
        else:
            # width-tolerant (int32 vs int64 hashes the same value), but
            # any value difference fails
            if not np.array_equal(a.to_numpy(), b.to_numpy()):
                neq = (a.to_numpy() != b.to_numpy()).nonzero()[0][:3]
                return False, f"col '{c}' differs at rows {neq}: {a.iloc[neq].tolist()} vs {b.iloc[neq].tolist()}"
    return True, ""


ORACLE = entry_mod.oracle_sql()
ALL = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, ddb, name):
    got = canon(ALL[name](spark, SF_DIR).toPandas())
    want = canon(ddb.execute(ORACLE[name]).df())
    ok, msg = compare(got, want)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    sdf = ALL[name](spark, SF_DIR)
    # the driver canonicalizes with pandas sort_values over all columns —
    # array-typed output columns crash it (round-1 multimodal_features)
    pdf = sdf.toPandas()
    for c in pdf.columns:
        if len(pdf) and isinstance(pdf[c].iloc[0], (list, np.ndarray)):
            raise AssertionError(f"{name}: array-typed column '{c}' violates contract")
    canon(pdf)  # must not raise
    assert len(sdf.columns) > 0


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
