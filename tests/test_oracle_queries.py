"""Differential oracle tests (SURVEY §5.1): every registered query with an
oracle SQL string must match DuckDB on the same parquet, at the driver's
correctness scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from duckdb_streaming_patterns_spark.oracle import run_diff
from duckdb_streaming_patterns_spark.queries import QUERIES

ORACLE_QUERIES = sorted(n for n, (_, sql) in QUERIES.items() if sql is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_duckdb_oracle(spark, sf_oracle, name):
    fn, sql = QUERIES[name]
    res = run_diff(spark, sf_oracle, name, fn, sql)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows}, oracle={res.oracle_rows})"


NO_ORACLE = sorted(n for n, (_, sql) in QUERIES.items() if sql is None)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs_rows_only(spark, sf_oracle, name):
    fn, _ = QUERIES[name]
    df = fn(spark, sf_oracle)
    assert df.count() >= 0
