"""Query registry — the engine's declared query surface.

Each entry pairs an idiomatic-PySpark implementation with (where
SQL-expressible) an ANSI/DuckDB oracle SQL string over the same parquet
tables. The driver's correctness gate runs both sides at sf0.01 and compares
row-count + schema + order-insensitive value-hash, with columns sorted by
name — so both sides MUST alias computed columns identically.

Determinism rules every entry follows (see functions/exact.py):
- double aggregates go through exact DECIMAL arithmetic (decimal sum →
  string → double), so both engines produce bit-identical doubles with NO
  round() anywhere — round() of a computed double flips on
  representational halves and is forbidden;
- integer sums are CAST to BIGINT in the oracle (DuckDB sum(int) widens
  to HUGEINT, which the driver's typed hash distinguishes);
- percentiles interpolate in exact decimal (functions/exact.pctl_sql);
- every top-k / limit query orders by a unique tiebreaker;
- no wall-clock, no RNG without a fixed seed.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    doc: str
    spark: SparkQuery
    oracle: str | None  # DuckDB-runnable SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, doc: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, doc=doc, spark=fn, oracle=oracle, tags=tags)
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate REGISTRY.
    from weather_monitoring_spark.plans import (  # noqa: F401
        analytics_queries,
        core_queries,
        extended_queries,
        llm_queries,
    )

    return REGISTRY
