"""Multimodal columns (SURVEY §2.11): image/audio/video as opaque binary
payloads + typed metadata, with decode / feature-extract / resize /
frame-sample as Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and tested. The actual media decode is STUBBED (this container has
no image/audio libraries): ``decode_payloads(..., codec="pil")`` raises
``NotImplementedError`` at the import seam, and the default
``codec="fake"`` is a deterministic byte-level decoder so every downstream
stage (batching, schema, partition sizing) runs for real.

Scale design: payloads stay in executor-local Arrow batches end to end —
no driver collection, no Python row loop. ``mapInPandas`` receives an
iterator of record batches, so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads; huge blobs are
handled by lowering that knob, not by new code. Feature columns come back
as plain numeric/array columns → normal columnar pipeline after extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary,"
    " meta struct<mime:string, n_bytes:long, source:string>"
)

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long,"
    " width int, height int, n_frames int, checksum string"
)


def attach_payloads(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a content column as an opaque binary payload + metadata struct —
    the canonical multimodal row shape. (Fixtures have no real media, so the
    payload is the UTF-8 encoding of the text column; the schema is the
    point.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        (
            F.when(F.col(id_col) % 3 == 0, F.lit("image"))
            .when(F.col(id_col) % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video"))
        ).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("fixture").alias("source"),
        ).alias("meta"),
    )


def decode_payloads(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode payload → media metadata via Arrow-batched mapInPandas.

    codec="fake" is the deterministic stub; codec="pil" is the real-decoder
    seam and raises NotImplementedError here (no media libs in this
    container)."""
    if codec == "pil":
        raise NotImplementedError(
            "real image decode needs PIL/ffmpeg on the cluster; "
            "this container ships the plumbing with codec='fake'"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec: {codec}")

    # Everything the worker runs is defined inside this closure so it is
    # pickled by value — the engine package need not be importable on
    # executors (only pandas/hashlib, which ship with the runtime).
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_decode(payload: bytes) -> tuple[int, int, int]:
            # deterministic media-decoder stand-in: metadata from bytes
            n = len(payload)
            w = 16 + (payload[0] if n else 0) % 64
            h = 16 + (payload[-1] if n else 0) % 64
            return w, h, 1 + (n % 7)

        for pdf in batches:
            decoded = pdf["payload"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "n_frames": decoded.map(lambda t: t[2]).astype("int32"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


def resize_stub(df: DataFrame, max_dim: int = 32) -> DataFrame:
    """'Resize': recompute metadata clamped to max_dim — demonstrates a
    second chained mapInPandas stage over decoded output."""

    def clamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            scale = (
                pd.concat([out["width"], out["height"]], axis=1).max(axis=1)
                / max_dim
            ).clip(lower=1.0)
            out["width"] = (out["width"] / scale).astype("int32").clip(lower=1)
            out["height"] = (out["height"] / scale).astype("int32").clip(lower=1)
            yield out

    return df.mapInPandas(clamp, df.schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """'Frame sampling' for video payloads: explode the payload into
    fixed-stride byte chunks (one row per pseudo-frame). Pure expression —
    no Python — showing array-of-binary handling at scan speed."""
    n = F.octet_length("payload")
    idx = F.sequence(F.lit(1), F.greatest(F.ceil(n / every_n_bytes), F.lit(1)))
    frames = F.transform(
        idx, lambda i: F.substring("payload", ((i - 1) * every_n_bytes + 1).cast("int"), every_n_bytes)
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select("doc_id", F.posexplode(frames).alias("frame_no", "frame_bytes"))
        .select(
            "doc_id",
            F.col("frame_no").cast("bigint").alias("frame_no"),
            F.octet_length("frame_bytes").cast("bigint").alias("frame_size"),
            F.md5("frame_bytes").alias("frame_md5"),
        )
    )
