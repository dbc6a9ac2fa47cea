from duckdb_streaming_patterns_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)
from duckdb_streaming_patterns_spark.functions.text import (
    tokens,
    distinct_tokens,
    shingles,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "tokens",
    "distinct_tokens",
    "shingles",
]
