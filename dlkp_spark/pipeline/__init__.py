from dlkp_spark.pipeline.dedup import exact_dedup_stats, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs  # noqa: F401
from dlkp_spark.pipeline.similarity import brute_cosine_topk, lsh_cosine_topk  # noqa: F401
from dlkp_spark.pipeline.textstats import doc_fingerprint, langid, quality_features  # noqa: F401
