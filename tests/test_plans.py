"""Physical-plan shape assertions: the optimizations the engine relies on
must actually appear in the plan (predicate pushdown, column pruning,
broadcast joins) — regressions here silently cost 10-100× at scale.
"""

import pytest
from pyspark.sql import functions as F

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, load_postings, prepare_docs


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    docs = prepare_docs(generate_web_pages(spark, 120, seed=42))
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=64, block_size=16, n_term_partitions=4),
                n_shards=1)
    return d


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_filter_pushed_to_parquet(spark, index_dir):
    df = load_postings(spark, index_dir).filter(F.col("term") == "w0003")
    plan = plan_of(df)
    assert "PushedFilters" in plan and "w0003" in plan, plan


def test_posting_scan_prunes_columns(spark, index_dir):
    df = load_postings(spark, index_dir).select("term", "df")
    plan = plan_of(df)
    # binary blobs must NOT be read for a stats-only projection
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "docs_vb" not in read_schema[0], plan


def test_query_terms_join_is_broadcast(spark, index_dir):
    from dlkp_spark.query.wand import wand_topk
    df = wand_topk(spark, index_dir, [(0, ["w0003", "w0010"])], BM25Params(), k=5)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_exact_bm25_broadcasts_query_side(spark):
    from dlkp_spark.contract import q_bm25_topk
    df = q_bm25_topk(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan


def test_doc_id_join_is_broadcast(spark):
    docs = prepare_docs(generate_web_pages(spark, 80, seed=1))
    plan = plan_of(docs)
    assert "BroadcastHashJoin" in plan, plan
