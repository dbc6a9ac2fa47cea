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
