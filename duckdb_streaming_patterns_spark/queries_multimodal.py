"""Multimodal query registrations — all three oracle-checked: payload
stats and frame sampling via byte-length/md5 parity, and the mapInPandas
decode+resize chain via the deterministic fake codec being an exact
SQL-reproducible function of the payload bytes (fixture text is ASCII)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.queries import register, _t
from duckdb_streaming_patterns_spark.operators import multimodal


@register(
    "multimodal_payload_stats",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + metadata: byte length and content checksum
    computed on the binary column (md5 of UTF-8 bytes == DuckDB md5(text))."""
    media = multimodal.attach_payloads(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "multimodal_frame_sample",
    """
    -- DuckDB lacks substring-over-BLOB; the fixture text is ASCII, so
    -- character slicing is byte slicing and md5(substring(text)) equals the
    -- Spark side's md5 over the byte slice of the UTF-8 payload.
    WITH media AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 3 = 2
    ), frames AS (
      SELECT doc_id,
             i - 1 AS frame_no,
             substring(text, CAST((i - 1) * 256 + 1 AS BIGINT), 256) AS frame_str
      FROM media,
           LATERAL unnest(range(1, greatest(CAST(ceil(n / 256.0) AS BIGINT), 1) + 1)) AS t(i)
    )
    SELECT doc_id,
           CAST(frame_no AS BIGINT) AS frame_no,
           CAST(octet_length(encode(frame_str)) AS BIGINT) AS frame_size,
           md5(frame_str) AS frame_md5
    FROM frames
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride pseudo-frame sampling over video payloads — binary
    slicing + per-frame checksums, pure expressions."""
    media = multimodal.attach_payloads(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return multimodal.frame_sample(media, every_n_bytes=256)


@register(
    "multimodal_decode_features",
    """
    -- The fake codec's metadata is a pure function of the payload bytes,
    -- and the fixture text is ASCII (octet_length==length for every doc at
    -- every sf), so first/last byte == ord() of first/last char and
    -- md5(text) == md5 of the UTF-8 payload: the whole Python decode+resize
    -- chain is reproducible in SQL. floor() before the int casts — DuckDB
    -- CAST rounds where pandas astype truncates.
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             length(text) AS n,
             16 + ord(substring(text, 1, 1)) % 64 AS w,
             16 + ord(substring(text, length(text), 1)) % 64 AS h,
             md5(text) AS checksum
      FROM documents
    ), scaled AS (
      SELECT *, greatest(greatest(w, h) / 32.0, 1.0) AS scale FROM m
    )
    SELECT doc_id, media_type,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(greatest(floor(w / scale), 1) AS INT) AS width,
           CAST(greatest(floor(h / scale), 1) AS INT) AS height,
           CAST(1 + n % 7 AS INT) AS n_frames,
           checksum
    FROM scaled
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (stubbed codec) + chained resize —
    the real plumbing for media feature extraction, now oracle-checked:
    the deterministic fake codec makes the Python path's output an exact
    SQL-reproducible function of the bytes. Decoder unit properties remain
    in tests/test_multimodal.py."""
    media = multimodal.attach_payloads(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return multimodal.resize_stub(multimodal.decode_payloads(media, codec="fake"))
