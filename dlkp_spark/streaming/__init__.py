from dlkp_spark.streaming.ingest import incremental_index_stream  # noqa: F401
