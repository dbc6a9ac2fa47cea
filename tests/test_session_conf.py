"""session_conf profile logic (pure dict — no Spark session needed).

The cluster profile (SPARK_GRAFT_PROD_CONF) must be OPT-IN: the bench's
cross-round comparability depends on the local defaults never changing
underneath it, while the production values the optimization guide
prescribes (§6/§9: zstd codecs, large scan splits, shuffled-hash joins,
Arrow UDF serialization) must be wired in code, not a doc footnote.
"""

from duckdb_streaming_patterns_spark.session import (
    _PROD_CONF,
    session_conf,
)


def test_default_profile_is_unchanged_local_conf():
    conf = session_conf(8, prod=False)
    # the invariants the bench and the oracle parity rest on
    assert conf["spark.sql.shuffle.partitions"] == "8"
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.session.timeZone"] == "UTC"
    assert conf["spark.sql.execution.arrow.pyspark.enabled"] == "true"
    # no production key leaks into the default profile
    for k in _PROD_CONF:
        assert k not in conf


def test_prod_profile_adds_exactly_the_cluster_confs():
    base = session_conf(8, prod=False)
    prod = session_conf(8, prod=True)
    assert {k: v for k, v in prod.items() if k not in base} == _PROD_CONF
    # and changes nothing the default profile pins
    assert {k: prod[k] for k in base} == base


def test_prod_flag_reads_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PROD_CONF", raising=False)
    assert "spark.io.compression.codec" not in session_conf(8)
    monkeypatch.setenv("SPARK_GRAFT_PROD_CONF", "1")
    assert session_conf(8)["spark.io.compression.codec"] == "zstd"
    monkeypatch.setenv("SPARK_GRAFT_PROD_CONF", "0")
    assert "spark.io.compression.codec" not in session_conf(8)


def test_driver_mem_override_wins():
    assert (
        session_conf(8, prod=False, driver_mem="4g")[
            "spark.driver.memory"
        ]
        == "4g"
    )
