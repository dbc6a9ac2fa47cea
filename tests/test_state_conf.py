"""Focused tests for the micro-batch loop conf context (round 17):
`_state_partitions` pins the loop's shuffle-partition count AND disables
AQE for the loop's duration — outermost context only, env-overridable —
restoring the session conf on exit. The AQE flip is the r17 per-batch
floor optimization (each materialized exchange is an AQE query stage =
a re-optimization pass + job submission of driver latency per
micro-batch); results are physical-plan-only and the whole driver
window re-verifies green against the oracle with it on.
"""

import os

from duckdb_streaming_patterns_spark.streaming.patterns import (
    _state_partitions,
)

AQE = "spark.sql.adaptive.enabled"
SHUF = "spark.sql.shuffle.partitions"


def test_loop_disables_aqe_and_restores(spark):
    assert spark.conf.get(AQE) == "true"
    before = spark.conf.get(SHUF)
    with _state_partitions(spark, 4):
        assert spark.conf.get(AQE) == "false"
        assert spark.conf.get(SHUF) == "4"
    assert spark.conf.get(AQE) == "true"
    assert spark.conf.get(SHUF) == before


def test_none_partitions_still_disables_aqe(spark):
    before = spark.conf.get(SHUF)
    with _state_partitions(spark, None):
        assert spark.conf.get(AQE) == "false"
        assert spark.conf.get(SHUF) == before
    assert spark.conf.get(AQE) == "true"


def test_nested_context_does_not_restore_early(spark):
    """A sub-pattern's context inside a composition must not flip AQE
    back on mid-flight (the r16 no-conf-races-in-overlap discipline):
    only the OUTERMOST context manages the flag."""
    with _state_partitions(spark, None):
        assert spark.conf.get(AQE) == "false"
        with _state_partitions(spark, None):
            assert spark.conf.get(AQE) == "false"
        # inner exit: still off — the outer context owns the restore
        assert spark.conf.get(AQE) == "false"
    assert spark.conf.get(AQE) == "true"


def test_env_opt_out_keeps_aqe_on(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BATCH_AQE", "1")
    with _state_partitions(spark, 4):
        assert spark.conf.get(AQE) == "true"
        assert spark.conf.get(SHUF) == "4"
    assert spark.conf.get(AQE) == "true"
