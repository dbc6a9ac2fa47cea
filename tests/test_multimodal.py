"""Multimodal plumbing tests: schema, batch shape, determinism, codec seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.operators import multimodal
from duckdb_streaming_patterns_spark.sources.tables import load_table


def _media(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(50)
    return multimodal.attach_payloads(docs, "doc_id", "text")


def test_attach_payloads_schema(spark, sf_small):
    media = _media(spark, sf_small)
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["meta"].startswith("struct<mime:string")
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_decode_is_deterministic_and_complete(spark, sf_small):
    media = _media(spark, sf_small)
    a = {r["doc_id"]: tuple(r) for r in multimodal.decode_payloads(media).collect()}
    b = {r["doc_id"]: tuple(r) for r in multimodal.decode_payloads(media).collect()}
    assert a == b
    assert len(a) == media.count()
    for r in a.values():
        # (doc_id, media_type, n_bytes, width, height, n_frames, checksum)
        assert r[2] > 0 and 16 <= r[3] < 80 and 16 <= r[4] < 80 and 1 <= r[5] <= 7


def test_resize_clamps_dimensions(spark, sf_small):
    media = _media(spark, sf_small)
    resized = multimodal.resize_stub(
        multimodal.decode_payloads(media), max_dim=32
    ).collect()
    assert all(r["width"] <= 32 and r["height"] <= 32 for r in resized)
    assert all(r["width"] >= 1 and r["height"] >= 1 for r in resized)


def test_real_codec_seam_raises(spark, sf_small):
    media = _media(spark, sf_small)
    with pytest.raises(NotImplementedError):
        multimodal.decode_payloads(media, codec="pil")


def test_frame_sample_covers_payload(spark, sf_small):
    media = _media(spark, sf_small)
    frames = multimodal.frame_sample(media, every_n_bytes=256)
    sizes = (
        frames.groupBy("doc_id")
        .agg(F.sum("frame_size").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    orig = {
        r["doc_id"]: r["n"]
        for r in media.filter(F.col("media_type") == "video")
        .select("doc_id", F.octet_length("payload").alias("n"))
        .collect()
    }
    assert {r["doc_id"] for r in sizes} == set(orig)
    for r in sizes:
        assert r["total"] == orig[r["doc_id"]]


def test_xmodal_ivf_probe_is_partition_pruned_and_recall_pinned(
    spark, sf_small
):
    """Round-11 (verdict finding #3): the index-backed cross-modal row
    probes the AT-REST cell-partitioned image index — the candidate scan
    carries a STATIC PartitionFilters on cell_id listing only the probed
    cells (n_probe/n_cells of the index's bytes read), and its result set
    keeps >= 0.6 recall@5 against the exact brute-force row on the
    fixture corpus."""
    import contextlib
    import io

    from duckdb_streaming_patterns_spark.queries import QUERIES
    from duckdb_streaming_patterns_spark.queries_multimodal import (
        q_multimodal_ann_ivf,
        q_multimodal_ann_retrieval,
    )

    got = q_multimodal_ann_ivf(spark, sf_small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    # the probed-cell scan: a non-empty static partition filter on cell_id
    assert "PartitionFilters" in plan, plan[:3000]
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*cell_id[^\]]*)\]", plan)
    assert m and m.group(1).strip(), plan[:3000]

    bf = q_multimodal_ann_retrieval(spark, sf_small)
    iv = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    bv = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    assert len(iv & bv) / len(bv) >= 0.6
