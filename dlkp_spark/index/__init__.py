from dlkp_spark.index.codec import (  # noqa: F401
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)
