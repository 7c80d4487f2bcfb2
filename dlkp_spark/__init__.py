"""dlkp_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Grafts the document-analysis semantics of ``midas-research/dlkp`` (BIO-tagged
keyphrase spans, decoded/deduped/scored as the reference does) into a
full-text search engine: SPIMI-style index build with delta+varbyte posting
compression and block-max metadata, and block-max WAND top-k BM25 querying
with a boosted ``keyphrase`` field.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, with Arrow-batched pandas UDFs (``mapInPandas``/``applyInPandas``)
only where built-in operators cannot express the semantics (tokenization,
posting compression, the WAND kernel). No per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"

from dlkp_spark.config import BM25Params, IndexConfig  # noqa: F401
