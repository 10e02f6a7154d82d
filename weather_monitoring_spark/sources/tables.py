"""Batch parquet table loaders for the driver's testdata.

Replaces the reference's per-record Avro Parquet reader loop
(``ElasticSearch/src/main/java/org/example/ParquetToElasticsearch.java:176-215``)
with Spark's vectorized parquet scan — column pruning and predicate pushdown
reach the scan automatically when callers select/filter on the returned
DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: File count above which a scan is assumed splittable enough without
#: reading footers (each file is at least one independent map unit).
_SPREAD_FILE_CAP = 256


#: (path, mtime signature) -> row-group count. Footer reads are driver-
#: side metadata-only but not free; un-memoized they ran on EVERY
#: load_table call — twice per call when both spread and pin are set
#: (q50) — r15 ADVICE. The mtime signature invalidates on replacement.
_SCAN_UNITS_MEMO: dict[tuple[str, float], int] = {}


def _scan_units(path: str) -> int:
    """Effective map-side parallelism cap of a parquet scan: Spark splits
    parquet by ROW GROUP, so a table of few files with one row group each
    runs its whole scan stage (and everything fused into it — filters,
    projections, explodes, partial aggregates, Python evaluation) on that
    many cores regardless of split math. Counts files, and only reads
    footers (driver-side, metadata-only) when the file count alone cannot
    prove the scan splittable — bounded work at any scale.

    Any layout this function cannot positively prove degenerate — a
    Hive-partitioned directory tree (``date=…/`` subdirectories), an
    empty or unreadable listing — reports _SPREAD_FILE_CAP ("assume
    splittable"), so spread_scan never injects a full-table exchange on
    a production partitioned table (r15 verdict #2 / ADVICE)."""
    try:
        sig = _mtime_sig(path)
    except OSError:
        return _SPREAD_FILE_CAP
    memo_key = (path, sig)
    hit = _SCAN_UNITS_MEMO.get(memo_key)
    if hit is not None:
        return hit
    if os.path.isfile(path):
        files = [path]
    else:
        try:
            entries = [os.path.join(path, f) for f in os.listdir(path)]
        except OSError:
            return _SPREAD_FILE_CAP
        if any(os.path.isdir(e) for e in entries):
            # Partitioned/nested layout: file count unknowable from one
            # level; a real partitioned table is massively splittable,
            # so never mark it degenerate.
            _SCAN_UNITS_MEMO[memo_key] = _SPREAD_FILE_CAP
            return _SPREAD_FILE_CAP
        files = [e for e in entries if e.endswith(".parquet")]
        if not files:
            # Empty/unrecognized listing: unknown, assume splittable.
            _SCAN_UNITS_MEMO[memo_key] = _SPREAD_FILE_CAP
            return _SPREAD_FILE_CAP
    if len(files) >= _SPREAD_FILE_CAP:
        units = len(files)
    else:
        try:
            import pyarrow.parquet as pq

            units = (
                sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
                or 1
            )
        except Exception:
            units = max(len(files), 1)
    _SCAN_UNITS_MEMO[memo_key] = units
    return units


#: (path, mtime signature) -> total row count from parquet footers.
#: Metadata only (the same class as _SCAN_UNITS_MEMO): never rows.
_FOOTER_ROWS_MEMO: dict[tuple[str, float], int | None] = {}

#: Above this many files, footer row-counting is left to the engine
#: (a distributed count) instead of a driver-side footer loop.
_FOOTER_ROWS_FILE_CAP = 4096


def table_rows(sf_dir: str, name: str) -> int | None:
    """Row count of one testdata table from parquet FOOTERS only —
    driver-side metadata, no Spark job, memoized per (path, mtime
    signature). Returns None when the layout defeats cheap counting
    (partitioned tree, too many files, unreadable footer) — callers
    fall back to a distributed count. Exists for operators that need a
    corpus-size-derived SHAPE parameter (e.g. the blocked-GEMM block
    count, where any count yields the identical pair set): an eager
    df.count() per plan build was one whole Spark job per bench pass."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        sig = _mtime_sig(path)
    except OSError:
        return None
    key = (path, sig)
    if key in _FOOTER_ROWS_MEMO:
        return _FOOTER_ROWS_MEMO[key]
    if os.path.isfile(path):
        files = [path]
    else:
        try:
            entries = [os.path.join(path, f) for f in os.listdir(path)]
        except OSError:
            return None
        if any(os.path.isdir(e) for e in entries):
            _FOOTER_ROWS_MEMO[key] = None
            return None
        files = [e for e in entries if e.endswith(".parquet")]
        if not files or len(files) > _FOOTER_ROWS_FILE_CAP:
            _FOOTER_ROWS_MEMO[key] = None
            return None
    try:
        import pyarrow.parquet as pq

        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        rows = None
    _FOOTER_ROWS_MEMO[key] = rows
    return rows


def _mtime_sig(path: str) -> float:
    """Invalidation signature for memo entries keyed on ``path``. For a
    plain file this is its mtime. For a directory-style table the
    directory mtime alone misses an in-place part-file overwrite (r15
    ADVICE), so fold in the max mtime of the direct children (one level
    — matches the flat layouts load_table reads; deeper trees are
    handled by _scan_units' assume-splittable branch before any memo
    consumer can go stale)."""
    mt = os.path.getmtime(path)
    if os.path.isdir(path):
        try:
            children = [os.path.join(path, f) for f in os.listdir(path)]
            mt = max([mt] + [os.path.getmtime(c) for c in children])
        except OSError:
            pass
    return mt


def spread_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Round-robin repartition a parquet-backed frame when (and only when)
    its file layout cannot feed the available cores — the guide's fix for
    the 'one huge unsplittable file' input-skew class (§2.5): the scan
    task then only reads + shuffle-writes, and the heavy per-row work
    downstream (expand/aggregate/explode/shingle/Arrow UDF) runs on every
    core instead of one per row group.

    Scale-adaptive by construction: a production table ships hundreds of
    files / row groups, so the condition is false and NO exchange is
    added — this is a guard against degenerate layouts, not a local[32]
    tuning constant. Column pruning pushes through the repartition, so
    the exchange carries only the columns the query reads. Safe for every
    registry query: results are order-insensitive by the determinism
    rules (exact decimal sums, unique tiebreakers, sorted arrays).
    Disable with SPARK_GRAFT_SPREAD=0."""
    if os.environ.get("SPARK_GRAFT_SPREAD", "1") == "0":
        return df
    n = spark.sparkContext.defaultParallelism
    if _scan_units(path) < n:
        return df.repartition(n)
    return df


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    spread: bool = False,
    pin: tuple[str, ...] | None = None,
) -> DataFrame:
    """Vectorized parquet scan of one testdata table.

    ``events.parquet`` carries a parquet TIMESTAMP(NANOS) column, which
    Spark's reader rejects outright (PARQUET_TYPE_ILLEGAL). We read nanos
    as long (``spark.sql.legacy.parquet.nanosAsLong``) and convert to a
    proper TimestampType with exact integer division — the driver's data is
    microsecond-aligned, so ``ns div 1000`` is lossless and matches what
    DuckDB presents for the same file.
    """
    # Defensive: the caller's session may not come from session.get_spark
    # (the driver harness builds its own). Timestamp-derived results
    # (to_date/hour/window/date_trunc) must render at UTC to match the
    # TZ-naive DuckDB oracle, so pin it at the loader boundary too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _cached_schema(spark, path, name)
    if name == "events":
        # Scope the legacy conf to this one read: it is consumed when the
        # relation is planned (verified: collects after restore still
        # succeed), and leaving it set session-wide would make every later
        # parquet read silently present TIMESTAMP(NANOS) columns as bigint
        # instead of erroring.
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            df = reader.parquet(path)
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    else:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(path)
    # Capture the RAW read schema (pre ts-conversion / NTZ-normalize) so
    # the next load of the same file skips the inference job.
    _remember_schema(spark, path, df)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = _normalize_ntz(df)
    # SPARK_GRAFT_SPREAD_FORCE=1 is the measurement knob: spread EVERY
    # load, so the per-query win/loss of the exchange can be measured
    # without editing call sites (scripts/probe_r15_spread.py).
    if spread or os.environ.get("SPARK_GRAFT_SPREAD_FORCE") == "1":
        df = spread_scan(spark, df, path)
    if pin is not None:
        # ``pin``: project to these columns and, when the file layout is
        # degenerate (fewer row groups than cores — the same condition
        # that gates spread_scan), localCheckpoint the projected scan so
        # a query that references the table from several branches decodes
        # it ONCE instead of once per branch. On a production layout the
        # scan is parallel and each branch's re-scan prunes its own
        # columns, so no pin is added — this, like spread_scan, guards a
        # degenerate layout rather than tuning for local mode. Explicit
        # column list (not '*') so the pinned blocks carry only what the
        # query reads; disable with SPARK_GRAFT_PIN=0.
        df = df.select(*pin)
        if (
            os.environ.get("SPARK_GRAFT_PIN", "1") != "0"
            and _scan_units(path) < spark.sparkContext.defaultParallelism
        ):
            df = df.localCheckpoint(eager=False)
    return df


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to session-local TimestampType.

    Parquet ``timestamp[us]`` without a zone annotation surfaces as
    TIMESTAMP_NTZ under Spark 4's reader. With the session tz pinned to UTC
    the cast is numerically a no-op, and it lets every downstream plan
    (``unix_micros``, ``F.window``, ``date_trunc``) treat all testdata
    timestamps uniformly as TimestampType — matching what DuckDB's oracle
    sees for the same file.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    # Top-level columns only by design: no testdata table nests
    # timestamps inside struct/array/map. Guard that assumption loudly —
    # a nested NTZ passing through un-cast would make unix_micros/window
    # plans diverge from the oracle silently.
    nested_ntz = [c for c, t in df.dtypes if t != "timestamp_ntz" and "timestamp_ntz" in t]
    if nested_ntz:
        raise NotImplementedError(
            f"TIMESTAMP_NTZ nested inside {nested_ntz}: _normalize_ntz only "
            "handles flat schemas; add a recursive cast before using this table"
        )
    if not ntz_cols:
        return df
    # The cast below resolves against the session timezone lazily (at
    # action time, not here) — it is only a numeric no-op under UTC, so
    # pin-and-check now rather than let a later tz mutation shift epochs.
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise AssertionError(
            f"NTZ normalization requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}); load tables via load_table, which pins it"
        )
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


#: Inferred read schema per ((applicationId, path, mtime)) — METADATA
#: memo only (column names/types from the parquet footer), never data.
#: Schema inference is one driver-side job per read; with ~60 load_table
#: calls per bench pass those footer jobs alone cost ~2 s (r15 profile).
#: The mtime key drops the entry if the file is replaced; keyed per
#: application so a new session (possibly different legacy-nanos conf)
#: re-infers.
_SCHEMA_MEMO: dict[tuple[str, str, float], object] = {}


def _cached_schema(spark: SparkSession, path: str, name: str):
    """Schema for ``path`` from the first inference in this application.

    Returns None on the first call (letting the reader infer and the
    memo capture it from the resulting frame via _remember_schema) or
    when the file's mtime changed."""
    try:
        key = (spark.sparkContext.applicationId, path, _mtime_sig(path))
    except OSError:
        return None
    return _SCHEMA_MEMO.get(key)


def _remember_schema(spark: SparkSession, path: str, df: DataFrame) -> None:
    try:
        key = (spark.sparkContext.applicationId, path, _mtime_sig(path))
    except OSError:
        return
    _SCHEMA_MEMO.setdefault(key, df.schema)


#: (applicationId, sf_dir) of the last register_views call, so repeated
#: plan builds in one session skip re-registration. This memoizes CATALOG
#: METADATA only (view name -> parquet path), never data or results —
#: each re-read of a view still scans the parquet files. Without it,
#: every SQL-surface plan build re-ran one schema-inference job per
#: table (~0.9 s of driver-side footer reads per build, r15 profile).
_VIEWS_REGISTERED: dict[str, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL surface)."""
    app = spark.sparkContext.applicationId
    # Temp views are scoped per SparkSession, not per SparkContext: a
    # sibling session (spark.newSession()) shares the applicationId but
    # has an empty view catalog (r15 ADVICE). The sentinel tableExists
    # check (one catalog metadata call, no job) catches that without
    # keying the memo on a recyclable id(spark).
    if _VIEWS_REGISTERED.get(app) == sf_dir and spark.catalog.tableExists(
        TABLES[0]
    ):
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_REGISTERED[app] = sf_dir
