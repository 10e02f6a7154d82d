"""The reference query surface (SURVEY.md §2.8 Q1-Q12) on the driver's
testdata.

Column mapping (FIXTURES.md F4): the ``events`` table stands in for the
weather stream — ``user_id`` ↔ ``station_id`` (key), ``event_id`` ↔ ``s_no``
(monotonic sequence), ``ts`` ↔ ``status_timestamp``, ``value`` ↔ the
``weather.*`` measures; ``event_type`` ↔ the enum-like ``battery_status``.
Dimension joins use the TPC-H-ish tables.

Each function is the idiomatic Spark plan; the ``oracle`` string is the
same query in DuckDB SQL. Aliases match exactly on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.exact import davg, dsum, o_davg, o_dsum
from weather_monitoring_spark.operators.core import (
    latest_per_key,
    point_lookup,
    sequence_gaps,
    top_k,
)
from weather_monitoring_spark.plans.registry import query
from weather_monitoring_spark.sources.tables import load_table

#: Rain threshold analog: reference filters weather.humidity > 70
#: (Rain-Detector/src/main/java/org/example/Main.java:33-45); events.value
#: spans ~[0, 490], so 350 selects a comparable minority band.
RAIN_THRESHOLD = 350.0
POINT_LOOKUP_KEY = 7  # exists at every sf (user_id 0-14 at sf0.001)
GAP_THRESHOLD = 500  # event_id is globally monotonic; per-user mean stride ~150


@query(
    "q01_rain_filter",
    "Q1 — theta filter on the measure column (rain-alert detection, "
    "Rain-Detector/.../Main.java:33-45). Predicate pushes down to the "
    "parquet scan.",
    oracle=f"""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events WHERE value > {RAIN_THRESHOLD}
    """,
    tags=("reference", "filter"),
)
def q01_rain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").filter(F.col("value") > RAIN_THRESHOLD)


@query(
    "q02_alert_projection",
    "Q2 — alert-message projection (mapValues prefix, "
    "Rain-Detector/.../Main.java:46-48).",
    oracle=f"""
        SELECT event_id,
               concat('Raining alert! High humidity detected: ', event_type,
                      ' user=', CAST(user_id AS VARCHAR)) AS alert
        FROM events WHERE value > {RAIN_THRESHOLD}
    """,
    tags=("reference", "projection"),
)
def q02_alert_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") > RAIN_THRESHOLD)
        .select(
            "event_id",
            F.concat(
                F.lit("Raining alert! High humidity detected: "),
                F.col("event_type"),
                F.lit(" user="),
                F.col("user_id").cast("string"),
            ).alias("alert"),
        )
    )


@query(
    "q03_latest_per_key",
    "Q3/A1 — latest record per key by sequence (BitCask getAll semantics, "
    "BitCask.java:171-180; deterministic max-by-s_no tightening per "
    "SURVEY.md §1.4). Spark plan: max_by hash-agg with map-side partials — "
    "one shuffle of one row per key per partition, no sort.",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tags=("reference", "window", "aggregate"),
)
def q03_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    return latest_per_key(df, ["user_id"], "event_id").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "q04_point_lookup",
    "Q4 — point lookup of one key's latest record (GET /station?id=, "
    "CentralStationServer.java:43-58). Filter-before-reduce so the key "
    "predicate reaches the scan.",
    oracle=f"""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM events WHERE user_id = {POINT_LOOKUP_KEY}
        ) WHERE rn = 1
    """,
    tags=("reference", "lookup"),
)
def q04_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    return point_lookup(df, ["user_id"], "event_id", user_id=POINT_LOOKUP_KEY).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "q05_schema_normalization",
    "Q5/P5/P8 — wire-format -> canonical schema projection: rename + "
    "case-normalization (convertToAvro, CentralStation.java:91-120; "
    "lowercase at ParquetToElasticsearch.java:234).",
    oracle="""
        SELECT user_id AS station_id,
               event_id AS s_no,
               lower(event_type) AS status_kind,
               upper(event_type) AS status_kind_uc,
               ts AS status_timestamp,
               value AS measure
        FROM events
    """,
    tags=("reference", "projection"),
)
def q05_schema_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("station_id"),
        F.col("event_id").alias("s_no"),
        F.lower("event_type").alias("status_kind"),
        F.upper("event_type").alias("status_kind_uc"),
        F.col("ts").alias("status_timestamp"),
        F.col("value").alias("measure"),
    )


@query(
    "q06_partition_derivation",
    "Q6/P10 — archive partition-key derivation (date, hour) from event time "
    "(ParquetArchiver.java:122-129), at the pinned session timezone.",
    oracle="""
        SELECT event_id, ts,
               CAST(ts AS DATE) AS date,
               CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour
        FROM events
    """,
    tags=("reference", "projection", "time"),
)
def q06_partition_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.to_date("ts").alias("date"),
        F.hour("ts").alias("hour"),
    )


@query(
    "q07_identity_dedup",
    "Q7 — idempotent-identity dedup on (key, seq) — the ES doc-id "
    "station_id_s_no (ParquetToElasticsearch.java:193). Exercised by "
    "unioning the stream with itself: dedup must restore exactly one copy.",
    oracle="""
        SELECT DISTINCT event_id, ts, user_id, event_type, value, props
        FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    """,
    tags=("reference", "dedup"),
)
def q07_identity_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    return df.unionByName(df).dropDuplicates(["user_id", "event_id"]).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "q08_sequence_gap_audit",
    "Q8/W2 — per-key sequence-gap audit (producers intentionally skip "
    "~10% of sequence numbers, WeatherStation.java:47-52). Projection is "
    "pruned to (key, seq) before the window shuffle.",
    oracle=f"""
        SELECT user_id, event_id, prev_seq, gap FROM (
            SELECT user_id, event_id,
                   lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_seq,
                   event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS gap
            FROM events
        ) WHERE gap >= {GAP_THRESHOLD}
    """,
    tags=("reference", "window"),
)
def q08_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    return sequence_gaps(df, ["user_id"], "event_id", min_gap=GAP_THRESHOLD).select(
        "user_id", "event_id", "prev_seq", "gap"
    )


@query(
    "q09_enum_distribution",
    "Q9 — enum-value distribution with global fraction (validates the "
    "battery 30/40/30 design, WeatherStation.java:96-105). Partial "
    "aggregation map-side; the window over the 5-row aggregate is free.",
    oracle="""
        SELECT event_type, cnt,
               cnt * 1.0 / SUM(cnt) OVER () AS frac
        FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type)
    """,
    tags=("reference", "aggregate"),
)
def q09_enum_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy()
    # Integer counts -> one double division of identical operands in both
    # engines -> bit-identical result; no rounding needed.
    return agg.select(
        "event_type",
        "cnt",
        (F.col("cnt") * F.lit(1.0) / F.sum("cnt").over(w)).alias("frac"),
    )


@query(
    "q10_hourly_rollup",
    "Q10 — per-key hourly rollup (the Kibana-over-ES aggregation surface, "
    "ParquetToElasticsearch.java:54-85): avg/max/min/count per "
    "(key, date, hour). One shuffle; partials map-side.",
    oracle=f"""
        SELECT user_id,
               CAST(ts AS DATE) AS date,
               CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
               {o_davg('value')} AS avg_value,
               max(value) AS max_value,
               min(value) AS min_value,
               count(*) AS cnt
        FROM events
        GROUP BY 1, 2, 3
    """,
    tags=("reference", "aggregate", "time"),
)
def q10_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.to_date("ts").alias("date"),
            F.hour("ts").alias("hour"),
            "value",
        )
        .groupBy("user_id", "date", "hour")
        .agg(
            davg(F.col("value")).alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "q11_dim_enrich_join",
    "Q11 — fact × small-dim enrichment join (stations dim ↔ nation/region; "
    "the dims are broadcast so the fact table never shuffles). "
    "orders→customer→nation→region rollup of revenue per region.",
    oracle=f"""
        SELECT r_name,
               count(*) AS n_orders,
               {o_dsum('o_totalprice')} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("reference", "join", "aggregate"),
)
def q11_dim_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # customer (~150k rows at sf1) is broadcastable at test scale; at 100 TB
    # it would shuffle — but nation/region (25/5 rows) are always broadcast,
    # so we pre-join the dims into one small mapping and broadcast that.
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        orders.join(
            F.broadcast(dim.select("c_custkey", "r_name")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@query(
    "q12_topk_extremes",
    "Q12/W4 — top-k extremes (Kibana-style). Spark compiles to "
    "TakeOrderedAndProject: per-partition heaps, no global sort. Unique "
    "tiebreaker (event_id) for determinism.",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events ORDER BY value DESC, event_id LIMIT 10
    """,
    tags=("reference", "topk"),
)
def q12_topk_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return top_k(df, [F.col("value").desc(), F.col("event_id")], 10)
