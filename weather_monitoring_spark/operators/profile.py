"""Data-profiling operators: per-column statistics and value histograms.

The profiling pass a pipeline runs before trusting a new data drop —
null rates, cardinalities, ranges, distribution shape. Both operators
are single-aggregation plans over the scan:

- ``profile_table``: one wide aggregate computing every column's stats
  in a single pass, then an unpivot to one row per column. Exact
  ``countDistinct`` is used so the result is oracle-checkable; Catalyst
  plans the multi-distinct aggregate with one Expand pass (row
  multiplication x |columns|, still a single scan). At 100 TB swap in
  ``approx_count_distinct`` via ``exact_distinct=False`` — same plan
  minus the Expand, at HLL precision (then rows-only checkable).
- ``histogram``: fixed-width binning with a clamp to [lo, hi); bin
  arithmetic is IEEE divide/floor only (correctly rounded, so both
  engines agree bit-for-bit — see functions/exact.py rules). Empty bins
  are emitted zero-filled via a tiny generated bin table so the result
  shape is a function of the binning, not the data.

Typed min/max slots: one long-format row per column can't hold a single
`min` of mixed types without casting — and casting doubles to strings is
engine-dependent formatting (forbidden). Instead the profile carries
(min_int, max_int) for integer columns, (min_num, max_num) for floating
columns, (min_str, max_str) for strings — each exact in its own domain.
Timestamps profile via ``unix_micros`` into the integer slots (micros
exceed double's 2^53 exact range, so they must NOT ride the num slots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_INT_TYPES = (LongType, IntegerType, ShortType)
_NUM_TYPES = (DoubleType, FloatType)
# Parquet timestamp[us] without a zone surfaces as TIMESTAMP_NTZ in Spark 4;
# both kinds profile identically via unix_micros (session tz pinned to UTC).
_TS_TYPES = (TimestampType, TimestampNTZType)


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """One row of statistics per (supported) column:
    (column, n_rows, n_nulls, n_distinct, min_int, max_int, min_num,
    max_num, min_str, max_str). Single scan, single aggregate."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            n
            for n, t in fields.items()
            if isinstance(t, _INT_TYPES + _NUM_TYPES + (StringType,) + _TS_TYPES)
        ]
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct

    # The NTZ->timestamp cast below resolves against the session timezone
    # at action time; it is only a numeric no-op under UTC, so fail fast
    # here instead of letting a non-UTC session shift profiled epochs.
    if any(isinstance(fields[c], TimestampNTZType) for c in cols):
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise AssertionError(
                f"profiling TIMESTAMP_NTZ columns requires "
                f"spark.sql.session.timeZone=UTC (got {tz!r})"
            )

    aggs: list = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        t = fields[c]
        aggs.append(F.sum(F.isnull(c).cast("long")).cast("long").alias(f"{c}__nulls"))
        aggs.append(nd(F.col(c)).cast("long").alias(f"{c}__distinct"))
        if isinstance(t, _TS_TYPES):
            micros = F.unix_micros(F.col(c).cast("timestamp"))
            lo, hi = F.min(micros), F.max(micros)
        else:
            lo, hi = F.min(F.col(c)), F.max(F.col(c))
        aggs.append(lo.alias(f"{c}__min"))
        aggs.append(hi.alias(f"{c}__max"))
    wide = df.agg(*aggs)

    def _slot(c: str, bound: str) -> list:
        t = fields[c]
        src = F.col(f"{c}__{bound}")
        null_l = F.lit(None).cast("long")
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        if isinstance(t, _INT_TYPES + _TS_TYPES):
            return [src.cast("long"), null_d, null_s]
        if isinstance(t, _NUM_TYPES):
            return [null_l, src.cast("double"), null_s]
        return [null_l, null_d, src.cast("string")]

    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            _slot(c, "min")[0].alias("min_int"),
            _slot(c, "max")[0].alias("max_int"),
            _slot(c, "min")[1].alias("min_num"),
            _slot(c, "max")[1].alias("max_num"),
            _slot(c, "min")[2].alias("min_str"),
            _slot(c, "max")[2].alias("max_str"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Fixed-width histogram of a numeric column over [lo, hi):
    (bin, bin_lo, bin_hi, cnt), all ``n_bins`` bins present (zero-filled).
    Out-of-range and null values are dropped; values exactly at ``hi``
    clamp into the last bin (standard closed-right top bin).

    width = (hi - lo) / n_bins and bin = floor((x - lo) / width) — IEEE
    divide/floor only, bit-stable across engines. One groupBy over at
    most ``n_bins`` distinct keys (map-side partials collapse the scan to
    n_bins rows per task) + a broadcast join against the generated bin
    table."""
    if not n_bins >= 1:
        raise ValueError("n_bins must be >= 1")
    width = (float(hi) - float(lo)) / float(n_bins)
    binned = (
        df.select(F.col(col).cast("double").alias("_x"))
        .filter(F.col("_x").isNotNull() & (F.col("_x") >= lo) & (F.col("_x") <= hi))
        .select(
            F.least(
                F.floor((F.col("_x") - F.lit(float(lo))) / F.lit(width)).cast("long"),
                F.lit(int(n_bins - 1)).cast("long"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spark = df.sparkSession
    bins = spark.range(n_bins).select(
        F.col("id").alias("bin"),
        (F.lit(float(lo)) + F.col("id").cast("double") * F.lit(width)).alias("bin_lo"),
        (F.lit(float(lo)) + (F.col("id") + 1).cast("double") * F.lit(width)).alias(
            "bin_hi"
        ),
    )
    return bins.join(binned, "bin", "left").select(
        "bin",
        "bin_lo",
        "bin_hi",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
    )
