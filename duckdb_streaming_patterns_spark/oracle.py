"""DuckDB differential-oracle harness (SURVEY §5.1).

Runs a Spark DataFrame and an equivalent DuckDB SQL string over the same
parquet fixtures, canonicalizes both results (sort columns by name, sort
rows, normalize timestamps/floats), and compares. This mirrors the driver's
per-round correctness gate so failures are caught locally first.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from duckdb_streaming_patterns_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with every fixture table registered as a view —
    the same pre-registration the driver provides."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out.reindex(sorted(out.columns), axis=1)
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            # strip tz, truncate to microseconds, render as string
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            out[col] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            out[col] = s.map(lambda v: _norm_obj(v))
    sort_cols = list(out.columns)
    out = out.sort_values(by=sort_cols, kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def _norm_obj(v):
    import datetime
    import numpy as np

    if v is None:
        return None
    if isinstance(v, (datetime.datetime, pd.Timestamp)):
        if getattr(v, "tzinfo", None) is not None:
            v = v.replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm_obj(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


@dataclass
class DiffResult:
    name: str
    row_count_match: bool
    values_match: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.row_count_match and self.values_match


def compare_frames(
    name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
    float_rtol: float = 0.0,
) -> DiffResult:
    """Default float tolerance is ZERO: the driver's gate hash-compares
    stringified values, so a loose local harness would pass results the
    gate rejects (it did — a half-even vs half-up rounding boundary slipped
    through at rtol=1e-6). Queries are engineered for bit-identical floats
    (sequential folds, DECIMAL thresholds, JVM-side HALF_UP rounding);
    hold them to it locally."""
    a = _canonicalize(spark_pdf)
    b = _canonicalize(oracle_pdf)
    res = DiffResult(
        name=name,
        row_count_match=len(a) == len(b),
        values_match=False,
        spark_rows=len(a),
        oracle_rows=len(b),
    )
    if not res.row_count_match:
        res.detail = f"row count {len(a)} vs {len(b)}"
        return res
    if sorted(a.columns) != sorted(b.columns):
        res.detail = f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
        return res
    mismatches = []
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = _float_series_close(av, bv, float_rtol)
        else:
            ok = _exact_series_eq(av, bv)
        if not ok:
            mismatches.append(col)
    if mismatches:
        res.detail = f"value mismatch in columns: {mismatches}"
        ex = []
        for col in mismatches[:2]:
            neq = a[col].astype(str) != b[col].astype(str)
            idx = neq[neq].index[:3]
            ex.append(f"{col}: spark={a.loc[idx, col].tolist()} oracle={b.loc[idx, col].tolist()}")
        res.detail += " | " + " ; ".join(ex)
        return res
    res.values_match = True
    return res


def _float_series_close(a: pd.Series, b: pd.Series, rtol: float) -> bool:
    af = pd.to_numeric(a, errors="coerce")
    bf = pd.to_numeric(b, errors="coerce")
    both_nan = af.isna() & bf.isna()
    if rtol == 0.0:
        return bool((both_nan | (af == bf)).all())
    close = (af - bf).abs() <= (rtol * bf.abs().clip(lower=1.0))
    return bool((both_nan | close).all())


def _exact_series_eq(a: pd.Series, b: pd.Series) -> bool:
    if len(a) == 0:
        return True

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\x00NULL"
        return str(v)

    return bool((a.map(norm) == b.map(norm)).all())


def run_diff(spark, sf_dir: str, name: str, spark_fn, oracle_sql: str) -> DiffResult:
    spark_pdf = spark_fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, oracle_pdf)
