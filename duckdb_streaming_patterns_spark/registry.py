"""Leaf query-registry module: the ``QUERIES`` dict plus the
``register``/``_t`` helpers every ``queries_*`` module uses.

Split out of ``queries.py`` (round 12) to break a latent import cycle:
``queries.py``'s tail imports the whole query family for registration
side-effects, and family modules also import each other's SQL fragments
(``queries_streaming`` builds oracles from ``queries_text`` constants) —
so a family module importing ``queries`` for ``register`` re-entered the
family chain and died with a partially-initialized module whenever it
was the FIRST import of the package. Family modules now depend only on
this leaf; ``queries.py`` re-exports everything so external callers
(entry, bench, tests) are unchanged — and importing ``queries`` is still
what populates the full registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duckdb_streaming_patterns_spark.sources.tables import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
QUERIES: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
