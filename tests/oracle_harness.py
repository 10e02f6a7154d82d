"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registry query through Spark AND its oracle SQL through DuckDB on
the same parquet tables, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted by
all columns, floats rounded).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from weather_monitoring_spark.sources.tables import TABLES

# Strict: with exact-decimal aggregation (functions/exact.py) both engines
# produce bit-identical doubles, so only genuinely-approximate paths (e.g.
# percentile interpolation) rely on this tolerance at all.
FLOAT_DECIMALS = 8


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, FLOAT_DECIMALS)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_query(spark, spec, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for one QuerySpec."""
    sdf = spec.spark(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    try:
        res = con.execute(spec.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{spec.name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    ns, nd = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
        raise AssertionError(f"{spec.name}: value mismatch; first diffs: {diffs}")
