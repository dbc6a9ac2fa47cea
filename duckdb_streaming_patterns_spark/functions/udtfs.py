"""Python UDTFs (SURVEY §2.10): the table-function escape hatch.

The reference consumes a third-party table function (tributary_scan_topic,
bonus_pattern.py:22,66) but defines none; Spark 4's Python UDTFs are the
engine's equivalent extension point. They run row-at-a-time in Python — the
SLOW path — so every UDTF here has a vectorized/native twin that is the
production shape (doc_chunks in queries_pipeline.py), and the differential
tests assert the two produce identical rows. Use a UDTF when per-row logic
genuinely cannot be expressed with array/HOF expressions; otherwise use the
native form.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql.functions import udtf

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


@udtf(returnType="chunk_start int, n_chunk_tokens int, chunk_md5 string")
class ChunkDocUDTF:
    """Context-window chunker as a lateral table function: one input doc →
    one row per 64-token window (stride 48). Same semantics as the native
    sequence/slice form in queries_pipeline.q_doc_chunks — tokenization is
    regex \\s+ on trimmed text so an empty doc yields one empty token,
    matching Spark's split and DuckDB's string_split_regex."""

    def eval(self, text: str):
        toks = re.split(r"\s+", (text or "").strip())
        n = len(toks)
        for start in range(1, max(1, n) + 1, CHUNK_STRIDE):
            window = toks[start - 1 : start - 1 + CHUNK_WINDOW]
            joined = " ".join(window)
            yield (
                start,
                len(window),
                hashlib.md5(joined.encode("utf-8")).hexdigest(),
            )


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on the session (idempotent)."""
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
