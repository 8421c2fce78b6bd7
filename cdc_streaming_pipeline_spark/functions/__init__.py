from cdc_streaming_pipeline_spark.functions.vector import cosine_similarity, dot, l2_norm
from cdc_streaming_pipeline_spark.functions.textfn import (
    normalize_ws,
    punct_ratio,
    token_count,
    tokens,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize_ws",
    "punct_ratio",
    "token_count",
    "tokens",
]
