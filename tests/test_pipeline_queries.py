"""Pipeline-query tests beyond the oracle gate: sampling determinism and
the HLL estimate's error bound (which has no SQL oracle by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.queries import QUERIES
from duckdb_streaming_patterns_spark.sources.tables import load_table


def test_hash_sample_is_deterministic_and_unbiased(spark, sf_oracle):
    fn, _ = QUERIES["sample_docs_hash"]
    a = {r["doc_id"] for r in fn(spark, sf_oracle).collect()}
    b = {r["doc_id"] for r in fn(spark, sf_oracle).collect()}
    assert a == b  # re-run → identical membership
    total = load_table(spark, sf_oracle, "documents").count()
    # 1/16 expected; allow generous binomial slack
    assert 0.03 * total < len(a) < 0.10 * total


def test_split_is_total_and_disjoint(spark, sf_oracle):
    fn, _ = QUERIES["train_val_test_split"]
    rows = {r["split"]: r["n_docs"] for r in fn(spark, sf_oracle).collect()}
    total = load_table(spark, sf_oracle, "documents").count()
    assert set(rows) == {"train", "val", "test"}
    assert sum(rows.values()) == total
    assert rows["train"] > rows["val"] and rows["train"] > rows["test"]


def test_approx_distinct_within_rsd_bound(spark, sf_oracle):
    fn, _ = QUERIES["approx_distinct_users"]
    approx = {r["event_type"]: r["approx_users"] for r in fn(spark, sf_oracle).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err < 0.05, (k, approx[k], exact[k])


def test_chunks_cover_every_token(spark, sf_oracle):
    """Stride-48/window-64 chunking: per doc, the last chunk must end
    exactly at the doc's token count (full coverage, no tail loss)."""
    fn, _ = QUERIES["doc_chunks"]
    chunks = fn(spark, sf_oracle)
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok")
    )
    last = chunks.groupBy("doc_id").agg(
        F.max(F.col("chunk_start") + F.col("n_chunk_tokens") - 1).alias("covered")
    )
    bad = last.join(docs, "doc_id").filter(F.col("covered") != F.col("n_tok"))
    assert bad.count() == 0
    assert chunks.filter(
        (F.col("n_chunk_tokens") < 1) | (F.col("n_chunk_tokens") > 64)
    ).count() == 0


def test_packing_conserves_tokens(spark, sf_oracle):
    fn, _ = QUERIES["pack_token_bins"]
    bins = fn(spark, sf_oracle)
    total = (
        load_table(spark, sf_oracle, "documents")
        .select(F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert bins.agg(F.sum("total_tokens")).first()[0] == total
    # bins are dense per shard: ids 0..max with no gaps
    from pyspark.sql import Window
    gaps = (
        bins.withColumn(
            "prev",
            F.lag("bin_id").over(Window.partitionBy("shard").orderBy("bin_id")),
        )
        .filter(F.col("prev").isNotNull() & (F.col("bin_id") != F.col("prev") + 1))
    )
    assert gaps.count() == 0


def test_domain_mix_keeps_full_weight_sources(spark, sf_oracle):
    """Weight-1.0 sources (src0-4) must survive sampling completely."""
    fn, _ = QUERIES["domain_mix_sample"]
    kept = {r["source"]: r["n_kept"] for r in fn(spark, sf_oracle).collect()}
    full = {
        r["source"]: r["n"]
        for r in load_table(spark, sf_oracle, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for s in ["src0", "src1", "src2", "src3", "src4"]:
        assert kept[s] == full[s]
    for s in ["src15", "src16", "src17", "src18", "src19"]:
        assert kept.get(s, 0) < full[s]
