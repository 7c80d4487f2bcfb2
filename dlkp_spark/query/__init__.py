from dlkp_spark.query.bm25 import exact_topk  # noqa: F401
from dlkp_spark.query.wand import bmw_topk_lists, wand_topk  # noqa: F401
