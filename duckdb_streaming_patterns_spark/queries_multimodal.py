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


from duckdb_streaming_patterns_spark.functions.vectors import (  # noqa: E402
    duckdb_cosine,
)
from duckdb_streaming_patterns_spark.operators import similarity  # noqa: E402

_XMODAL_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
               FROM embeddings WHERE vec_id < 3),
         c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS c_vec,
                      CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
                      md5(d.text) AS payload_md5
               FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
               WHERE d.doc_id % 3 = 0),
         s AS (SELECT query_id, neighbor_id, n_bytes, payload_md5,
                      {duckdb_cosine("q_vec", "c_vec")} AS cosine
               FROM q, c WHERE query_id <> neighbor_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, neighbor_id)
                           AS rank
               FROM s)
    SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine,
           CAST(rank AS BIGINT) AS rank, n_bytes, payload_md5
    FROM r WHERE rank <= 5
"""


@register("multimodal_ann_retrieval", _XMODAL_ORACLE)
def q_multimodal_ann_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval: top-5 nearest IMAGE payloads per query
    embedding, each hit carrying its payload metadata — the
    composition a multimodal corpus actually serves (embedding index over
    one modality, joined back to binary-payload metadata). The modality
    filter semi-joins the embedding corpus BEFORE similarity scoring
    (score only what can match), and the payload bytes never enter the
    similarity shuffle — only the narrow (n_bytes, md5) projection rides
    along."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    media = multimodal.attach_payloads(docs, "doc_id", "text")
    images = media.filter(F.col("media_type") == "image").select(
        F.col("doc_id").alias("vec_id"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )
    corpus = emb.join(images, "vec_id")
    queries = emb.filter(F.col("vec_id") < 3)
    hits = similarity.knn_bruteforce(corpus, queries, k=5)
    return hits.join(
        images.select(
            F.col("vec_id").alias("neighbor_id"), "n_bytes", "payload_md5"
        ),
        "neighbor_id",
    ).select(
        "query_id", "neighbor_id", "cosine", "rank", "n_bytes", "payload_md5"
    )
