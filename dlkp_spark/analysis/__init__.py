from dlkp_spark.analysis.analyzer import analyze, extract_text_py, tokenize_py  # noqa: F401
from dlkp_spark.analysis.keyphrase import (  # noqa: F401
    extract_kp_from_tags,
    tag_and_extract,
    tag_tokens,
)
