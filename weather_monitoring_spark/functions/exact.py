"""Cross-engine-deterministic aggregation helpers.

Floating-point sums are order-dependent: Spark's partial aggregation tree
and DuckDB's sequential sum produce doubles differing in the last ulps, and
``round()`` then diverges whenever the true value sits near a rounding
boundary (observed: round(66.55375, 4) → 66.5538 in Spark [BigDecimal
HALF_UP on the shortest repr] vs 66.5537 in DuckDB [float multiply+floor]).

The fix is to make the aggregate *bit-identical before any rounding*:

1. cast each measure to an exact DECIMAL (cross-engine deterministic: a
   double is never exactly on a scale-k decimal half, so both engines'
   round-to-scale casts agree for every representable input);
2. SUM in decimal — exact, order-independent, identical in both engines;
3. cast the final decimal to double — round-to-nearest of the same exact
   value → identical bits. Averages divide that double by the group count:
   one IEEE-754 division of identical operands → identical bits.

No ``round()`` is needed anywhere, so no boundary cases exist.

Decimal widths are chosen so every intermediate stays ≤ DECIMAL(38, s) in
BOTH engines' precision-propagation rules (Spark: p1+p2+1; DuckDB: p1+p2
for multiply) — beyond 38 Spark silently rounds and DuckDB errors, so
expressions like TPC-H's ``price*(1-disc)*(1+tax)`` must pre-narrow the
rate factors back to DECIMAL(8,6) (exact: rates have ≤6 decimals).

This matters beyond the oracle gate: at 100 TB, decimal aggregation is also
how you keep revenue totals reproducible run-to-run under AQE re-planning
(double sums change with partitioning; decimal sums do not).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Exact carrier for 2-decimal measures (prices, quantities, event values).
MEASURE = "decimal(18,2)"
#: Exact carrier for small rate factors (discount, tax — ≤6 decimals).
RATE = "decimal(8,6)"


def dec_to_double(col: Column) -> Column:
    """Correctly-rounded decimal -> double, via string.

    Java's ``BigDecimal.doubleValue()`` (what Spark's decimal->double cast
    uses) is NOT correctly rounded once the decimal exceeds ~15 significant
    digits — it computes unscaled/10^scale in double arithmetic, off by
    1-2 ulp from DuckDB's conversion. ``Double.parseDouble`` of the plain
    decimal string IS correctly rounded in both engines, so the final cast
    goes decimal -> string -> double on both sides.
    """
    return col.cast("string").cast("double")


def dsum(col: Column, dectype: str = MEASURE) -> Column:
    """Order-independent exact sum of a double measure, as double."""
    return dec_to_double(F.sum(col.cast(dectype)))


def davg(col: Column, dectype: str = MEASURE) -> Column:
    """Cross-engine-deterministic mean: exact decimal sum / count."""
    return dec_to_double(F.sum(col.cast(dectype))) / F.count(F.lit(1))


def one_minus(col: Column) -> Column:
    """``(1 - rate)`` pre-narrowed back to RATE so downstream decimal
    products stay ≤38 digits in both engines (exact: rates have ≤6
    decimals, so the narrowing loses nothing)."""
    return (F.lit(1) - col.cast(RATE)).cast(RATE)


def one_plus(col: Column) -> Column:
    """``(1 + rate)`` pre-narrowed back to RATE (see one_minus)."""
    return (F.lit(1) + col.cast(RATE)).cast(RATE)


#: Exact carrier for percentile interpolation (6 decimals of the measure).
PCTL_DEC = "decimal(18,6)"


def pctl_sql(vals: str, q100: int) -> str:
    """Spark SQL: exact linearly-interpolated percentile ``q100``/100 over a
    *sorted* array of DECIMAL(18,6) values.

    Rationale: ``percentile()``/``quantile_cont`` interpolate in double
    arithmetic with engine-specific expression orderings, and ``round()``
    of the result flips on representational halves (the pattern this module
    forbids). Here position and fraction are integers (``(n-1)*q100`` is
    exact), the interpolation ``lo*100 + (hi-lo)*frac100`` stays in exact
    decimal, and the single final ``/100`` is one IEEE division of
    identical doubles — bit-identical cross-engine, no rounding anywhere.
    """
    n = f"size({vals})"
    pos = f"((CAST({n} AS BIGINT) - 1) * {q100})"
    ilo = f"(CAST({pos} DIV 100 AS INT) + 1)"
    ihi = f"LEAST({ilo} + 1, {n})"
    frac = f"CAST({pos} % 100 AS DECIMAL(3,0))"
    lo = f"element_at({vals}, {ilo})"
    hi = f"element_at({vals}, {ihi})"
    x100 = f"({lo} * CAST(100 AS DECIMAL(3,0)) + ({hi} - {lo}) * {frac})"
    return f"CAST(CAST({x100} AS STRING) AS DOUBLE) / 100"


def o_pctl_sql(vals: str, q100: int) -> str:
    """DuckDB mirror of :func:`pctl_sql` (1-based list indexing)."""
    n = f"len({vals})"
    pos = f"((CAST({n} AS BIGINT) - 1) * {q100})"
    ilo = f"(CAST({pos} // 100 AS INT) + 1)"
    ihi = f"LEAST({ilo} + 1, {n})"
    frac = f"CAST({pos} % 100 AS DECIMAL(3,0))"
    lo = f"{vals}[{ilo}]"
    hi = f"{vals}[{ihi}]"
    x100 = f"({lo} * CAST(100 AS DECIMAL(3,0)) + ({hi} - {lo}) * {frac})"
    return f"CAST(CAST({x100} AS VARCHAR) AS DOUBLE) / 100"


# --- oracle-side (DuckDB SQL) mirrors -----------------------------------

def o_dsum(expr: str, dectype: str = "DECIMAL(18,2)") -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS {dectype})) AS VARCHAR) AS DOUBLE)"


def o_davg(expr: str, dectype: str = "DECIMAL(18,2)") -> str:
    return f"{o_dsum(expr, dectype)} / count(*)"


def o_measure(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def o_one_minus(expr: str) -> str:
    return f"CAST(1 - CAST({expr} AS DECIMAL(8,6)) AS DECIMAL(8,6))"


def o_one_plus(expr: str) -> str:
    return f"CAST(1 + CAST({expr} AS DECIMAL(8,6)) AS DECIMAL(8,6))"
