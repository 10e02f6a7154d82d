"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registry query through Spark AND its oracle SQL through DuckDB on
the same parquet tables, then compares row count, column names, and an
order-insensitive TYPED value comparison.

Fidelity notes (learned from round 1, where the local gate was weaker than
the driver's and let two type artifacts through):

- The oracle side is fetched **as pandas** (``rel.df()``), the same
  conversion the driver applies — so a DuckDB HUGEINT (e.g. ``sum(int)``)
  becomes float64 and *fails* against a Spark BIGINT even when the values
  are numerically equal. That is the driver's observed behavior for
  q40/q44 in round 1, now reproduced locally.
- Floats are compared EXACTLY (bit-for-bit via ``hex()``), never rounded:
  the exact-decimal aggregation rules (functions/exact.py) are supposed to
  make both engines produce identical doubles, and this gate now proves it.
- Every cell carries a kind tag (int/float/bool/str/...), so 123 != 123.0.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

from weather_monitoring_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    """Typed, unrounded normalization of one cell."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v.hex())
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        # DATE columns surface as python dates from Spark but as midnight
        # datetime64 from DuckDB's pandas conversion; the driver equates
        # them (q06 was green in round 1), so canonicalize to midnight.
        return ("t", datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _norm_cell(x)) for k, x in v.items())))
    if hasattr(v, "__len__") or hasattr(v, "__iter__"):  # list/tuple/ndarray
        return ("a", tuple(_norm_cell(x) for x in v))
    return ("?", str(v))


def _norm_pdf(pdf: pd.DataFrame) -> list[tuple]:
    """Sorted-column, sorted-row, typed normalization of a pandas frame."""
    pdf = pdf[sorted(pdf.columns)]
    out = []
    for row in pdf.itertuples(index=False, name=None):
        cells = []
        for v in row:
            # pandas nulls: None, NaN (float cols), NaT (datetime cols).
            if v is None or v is pd.NaT:
                cells.append(None)
            elif isinstance(v, float) and math.isnan(v):
                # NaN in a float64 column is either a true NaN or a null
                # from int->float promotion; both sides promote the same
                # way, so normalizing to None is symmetric.
                cells.append(None)
            elif isinstance(v, pd.Timestamp):
                cells.append(("t", v.to_pydatetime().replace(tzinfo=None).isoformat()))
            else:
                cells.append(_norm_cell(v))
        out.append(tuple(cells))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_query(spark, spec, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for one QuerySpec."""
    sdf = spec.spark(spark, sf_dir)
    s_pdf = sdf.toPandas()

    con = duck_connection(sf_dir)
    try:
        d_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()

    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), (
        f"{spec.name}: column mismatch spark={sorted(s_pdf.columns)} "
        f"duck={sorted(d_pdf.columns)}"
    )
    assert len(s_pdf) == len(d_pdf), (
        f"{spec.name}: row count mismatch spark={len(s_pdf)} duck={len(d_pdf)}"
    )
    ns, nd = _norm_pdf(s_pdf), _norm_pdf(d_pdf)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
        raise AssertionError(f"{spec.name}: value mismatch; first diffs: {diffs}")
