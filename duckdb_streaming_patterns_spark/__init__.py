"""PySpark-native analytics engine with the query and data-processing
capabilities of ``guillesd/duckdb-streaming-patterns`` (reference surveyed in
SURVEY.md), extended with large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Architecture: declarative DataFrame/SQL plans optimized by Catalyst; Pandas
UDFs only where built-ins can't express the semantics; Structured Streaming
for the reference's four streaming patterns.
"""

from duckdb_streaming_patterns_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
