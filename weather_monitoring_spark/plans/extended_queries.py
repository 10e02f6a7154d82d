"""Extended declared surface: event-time windows, sessionization, pivot,
semi/anti joins, skew-safe aggregation, conditional aggregation, the raw
SQL API, and the scalar string/date function library — rounding out the
"absent but declared" operators of SURVEY.md §2.3-§2.5 with oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.exact import o_davg
from weather_monitoring_spark.plans.registry import query
from weather_monitoring_spark.sources.tables import load_table, register_views

SESSION_GAP_MIN = 30
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q38_time_windows",
    "Event-time windows, tumbling AND sliding in one result: 6-hour "
    "tumbling buckets per event_type (the batch shape of the streaming "
    "rollup, streaming/windows.py) unioned with 12h-wide/6h-slide "
    "sliding counts (each row lands in exactly two windows). Spark "
    "`window()` and DuckDB `time_bucket` agree because both align "
    "buckets to midnight for divisor-of-day widths.",
    oracle=f"""
        SELECT 'tumbling_6h' AS window_kind,
               time_bucket(INTERVAL '6 hours', ts) AS window_start,
               event_type,
               count(*) AS cnt,
               {o_davg('value')} AS avg_value
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'sliding_12h_6h' AS window_kind,
               window_start,
               CAST(NULL AS VARCHAR) AS event_type,
               count(*) AS cnt,
               CAST(NULL AS DOUBLE) AS avg_value
        FROM (
            SELECT unnest([time_bucket(INTERVAL '6 hours', ts),
                           time_bucket(INTERVAL '6 hours', ts) - INTERVAL '6 hours']) AS window_start
            FROM events
        )
        GROUP BY 2
    """,
    tags=("extended", "window", "time"),
)
def q38_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_monitoring_spark.functions.exact import davg

    ev = load_table(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), davg(F.col("value")).alias("avg_value"))
        .select(
            F.lit("tumbling_6h").alias("window_kind"),
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "avg_value",
        )
    )
    sliding = (
        ev.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("sliding_12h_6h").alias("window_kind"),
            F.col("w.start").alias("window_start"),
            F.lit(None).cast("string").alias("event_type"),
            "cnt",
            F.lit(None).cast("double").alias("avg_value"),
        )
    )
    return tumbling.unionByName(sliding)


@query(
    "q40_sessionization",
    f"Gap-based sessionization ({SESSION_GAP_MIN} min): session boundary "
    "where the per-user gap exceeds the threshold, session id by running "
    "sum of boundaries, then per-session rollup. One shuffle on the key; "
    "the streaming-native variant is streaming/windows.session_rollup.",
    oracle=f"""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL '{SESSION_GAP_MIN} minutes'
                         OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   -- DuckDB's sum(int) is HUGEINT; Spark's window sum is
                   -- BIGINT — CAST so the typed value-hash agrees.
                   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM marked
        )
        SELECT user_id, session_id, min(ts) AS session_start,
               max(ts) AS session_end, count(*) AS n_events
        FROM sessions GROUP BY 1, 2
    """,
    tags=("extended", "window", "session"),
)
def q40_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        # Compare at microsecond precision: casting ts to long truncates to
        # seconds and misclassifies sub-second boundary gaps. The cast to
        # TIMESTAMP absorbs TIMESTAMP_NTZ parquet columns (session tz is
        # pinned to UTC in load_table, so the epoch value is unchanged).
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
            > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q41_pivot",
    "Pivoted per-user event counts (explicit pivot values keep the plan "
    "one-pass; the oracle is the equivalent conditional aggregation).",
    oracle=f"""
        SELECT user_id,
               {", ".join(f"count(*) FILTER (event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
        FROM events GROUP BY user_id
    """,
    tags=("extended", "pivot"),
)
def q41_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )


@query(
    "q42_semi_anti_join",
    "EXISTS / NOT EXISTS as left-semi + left-anti joins: customers with "
    "at least one open order and no finished order. Semi/anti joins ship "
    "only the key column of the probe side.",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("extended", "join", "semi"),
)
def q42_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        customer.join(open_keys, customer.c_custkey == open_keys.o_custkey, "left_semi")
        .join(fin_keys, customer.c_custkey == fin_keys.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "q43_salted_aggregate",
    "Skew-safe two-stage aggregation: salt the hot key space (8 shards), "
    "partially aggregate per (key, salt), then combine per key. Result is "
    "identical to the direct groupBy (the oracle), but the first shuffle "
    "spreads a hot key over 8 reducers — the manual fallback when AQE "
    "skew handling can't apply (e.g. high-cardinality aggs).",
    oracle="""
        SELECT event_type, count(*) AS cnt, CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type
    """,
    tags=("extended", "aggregate", "skew"),
)
def q43_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stage1 = (
        ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(8)))
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_sum"),
        )
    )
    return stage1.groupBy("event_type").agg(
        F.sum("_cnt").alias("cnt"),
        F.sum("_sum").cast("string").cast("double").alias("sum_value"),
    )


@query(
    "q44_conditional_aggregate",
    "Conditional aggregation: per-nation order stats with CASE-filtered "
    "counts and sums (the idiom behind every dashboard metric).",
    oracle="""
        SELECT n_name,
               count(*) AS n_orders,
               -- CASTs: DuckDB sum(int) yields HUGEINT, Spark BIGINT.
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               max(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS max_open_price
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    tags=("extended", "aggregate"),
)
def q44_conditional_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias(
                "n_urgent"
            ),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "n_finished"
            ),
            F.max(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))).alias(
                "max_open_price"
            ),
        )
    )


# q45 (spark.sql surface) merged into q53 (also spark.sql, and the harder
# SQL-path case: decorrelation); standalone formulation in extra_checks.py.


@query(
    "q46_scalar_functions",
    "The scalar function library in one projection over orders: string "
    "ops (case, substring, replace, padding, trim, concat, length, "
    "position) + date/time ops (truncation, extraction, arithmetic, "
    "boundaries — pinned to UTC by session.py so both engines agree).",
    oracle="""
        SELECT o_orderkey,
               lower(o_orderpriority) AS prio_lc,
               upper(concat(o_orderstatus, '-', o_orderpriority)) AS status_prio_uc,
               substr(o_orderpriority, 3, 6) AS prio_word,
               replace(o_orderpriority, '-', '_') AS prio_snake,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
               trim(concat('  ', o_orderstatus, '  ')) AS status_trim,
               CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
               CAST(strpos(o_orderpriority, 'URGENT') AS INTEGER) AS urgent_pos,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
               CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month_num,
               CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day,
               CAST(o_orderdate AS DATE) + INTERVAL '30 days' AS due_ts,
               last_day(CAST(o_orderdate AS DATE)) AS month_end
        FROM orders
    """,
    tags=("extended", "scalar", "time"),
)
def q46_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lower("o_orderpriority").alias("prio_lc"),
        F.upper(
            F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority"))
        ).alias("status_prio_uc"),
        F.substring("o_orderpriority", 3, 6).alias("prio_word"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("prio_snake"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.trim(F.concat(F.lit("  "), F.col("o_orderstatus"), F.lit("  "))).alias(
            "status_trim"
        ),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        F.instr(F.col("o_orderpriority"), "URGENT").alias("urgent_pos"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.to_date("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp")
        .alias("due_ts"),
        F.last_day("o_orderdate").alias("month_end"),
    )


# q48 (union+intersect) merged into q16's full set-op pipeline; the
# standalone formulation remains oracle-checked in extra_checks.py.


@query(
    "q49_per_group_ordinal",
    "Per-entity sequencing — ordinal + inter-event gap per user via "
    "row_number() + lag(unix_micros): pure Catalyst, one shuffle on the "
    "key, no Python boundary. This is the production plan for per-group "
    "logic that window functions CAN express; the grouped-map "
    "applyInPandas surface (for logic they can't) is the byte-identical "
    "x_per_group_pandas demo in extra_checks.py, oracle-checked there "
    "(~6x slower — the measured cost of crossing into Python).",
    oracle="""
        SELECT user_id, event_id,
               CAST(row_number() OVER w AS INTEGER) AS ordinal,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("extended", "window"),
)
def q49_per_group_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("ordinal"),
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
    )


def pandas_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map surface demo — the same result as the
    registered q49_per_group_ordinal computed in a per-group pandas
    function (Arrow moves each group as one columnar batch; one shuffle
    on the key). Kept as the pattern for custom per-entity logic that
    window functions genuinely can't express; oracle-checked in
    extra_checks.py as x_per_group_pandas (outputs are exact integers,
    so even the Python path hash-matches)."""
    import pandas as pd

    def per_user(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # int64 microseconds stay < 2^53 -> the diff is exact
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "ordinal": pd.Series(range(1, len(pdf) + 1), dtype="int32"),
                "gap_us": us.diff().astype("Int64"),
            }
        )

    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(per_user, "user_id long, event_id long, ordinal int, gap_us long")
    )


@query(
    "q53_correlated_subquery",
    "Correlated scalar subquery — customers above their nation's average "
    "balance. Catalyst decorrelates this into an aggregate + join "
    "(no per-row re-execution); written via spark.sql, so this also "
    "carries the raw-SQL-surface coverage (the simpler q45 formulation "
    "lives in extra_checks.py).",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer i
            WHERE i.c_nationkey = c.c_nationkey
        )
    """,
    tags=("extended", "subquery"),
)
def q53_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer i
            WHERE i.c_nationkey = c.c_nationkey
        )
        """
    )


@query(
    "q54_array_agg_explode",
    "Array round-trip: ordered collection aggregation (sorted distinct "
    "event types per user, rendered deterministically) followed by the "
    "table-generating projection back out (posexplode with ordinal) — "
    "covers collect_set/sort_array/array_join AND generator/LATERAL in "
    "one oracle-checked pipeline.",
    oracle="""
        WITH agg AS (
            SELECT user_id,
                   list_sort(list_distinct(list(event_type))) AS arr,
                   count(*) AS cnt
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               array_to_string(arr, ',') AS types,
               cnt,
               CAST(i - 1 AS INTEGER) AS pos,
               arr[i] AS event_type
        FROM agg, unnest(range(1, len(arr) + 1)) AS u(i)
    """,
    tags=("extended", "aggregate", "array", "generator"),
)
def q54_array_agg_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sort_array(F.collect_set("event_type")).alias("arr"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return agg.select(
        "user_id",
        F.array_join("arr", ",").alias("types"),
        "cnt",
        F.posexplode("arr").alias("pos", "event_type"),
    )


@query(
    "q56_outer_join_zerofill",
    "Left outer join + null handling: every customer with their order "
    "stats, zero-filled for customers who never ordered (the join family's "
    "remaining member; inner/semi/anti/broadcast/as-of are q11/q42/q17).",
    oracle="""
        SELECT c_custkey,
               coalesce(o.n_orders, 0) AS n_orders,
               coalesce(o.total_spent, 0.0) AS total_spent,
               o.n_orders IS NULL AS never_ordered
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey,
                   count(*) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_spent
            FROM orders GROUP BY o_custkey
        ) o ON c.c_custkey = o.o_custkey
    """,
    tags=("extended", "join", "outer"),
)
def q56_outer_join_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("total_spent"),
        )
    )
    return customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
        F.col("n_orders").isNull().alias("never_ordered"),
    )


@query(
    "q57_window_zoo",
    "Window-function coverage: dense_rank, rank, ntile, percent_rank, "
    "cume_dist, first/nth value, a numeric RANGE frame, plus ordered "
    "running-sum and moving-average frames (the time-series serving "
    "surface) — the full analytic-window zoo in one per-key pass. Ranks "
    "and counts are integers; the running aggregates go through exact "
    "decimal -> cross-engine exact throughout.",
    oracle="""
        SELECT user_id, event_id, value,
               dense_rank()  OVER wv AS dr,
               rank()        OVER wv AS value_rank,
               ntile(4)      OVER wv AS quartile,
               percent_rank() OVER wv AS pr,
               cume_dist()   OVER wv AS cd,
               first_value(event_id) OVER wv AS top_event,
               nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY value DESC, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_event,
               count(*) OVER (PARTITION BY user_id ORDER BY value
                              RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW) AS near_below,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / count(*) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS moving_avg_10
        FROM events
        WINDOW wv AS (PARTITION BY user_id ORDER BY value DESC, event_id)
    """,
    tags=("extended", "window"),
)
def q57_window_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_monitoring_spark.functions.exact import MEASURE

    ev = load_table(spark, sf_dir, "events")
    wv = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    wv_rows = wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered = Window.partitionBy("user_id").orderBy("event_id")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = ordered.rowsBetween(-9, Window.currentRow)
    dec_value = F.col("value").cast(MEASURE)
    # fractional RANGE frames aren't expressible through the python
    # Window API (int offsets only) — SQL text handles them
    near_below = F.expr(
        "count(*) OVER (PARTITION BY user_id ORDER BY value"
        " RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.dense_rank().over(wv).alias("dr"),
        F.rank().over(wv).alias("value_rank"),
        F.ntile(4).over(wv).alias("quartile"),
        F.percent_rank().over(wv).alias("pr"),
        F.cume_dist().over(wv).alias("cd"),
        F.first("event_id").over(wv).alias("top_event"),
        F.nth_value("event_id", 2).over(wv_rows).alias("second_event"),
        near_below.alias("near_below"),
        F.sum(dec_value).over(running).cast("double").alias("running_sum"),
        (
            F.sum(dec_value).over(moving).cast("double")
            / F.count(F.lit(1)).over(moving)
        ).alias("moving_avg_10"),
    )


@query(
    "q58_edit_distance",
    "Edit-distance fuzzy matching (the string cousin of the embedding "
    "near-dup family): close pairs of distinct part types by Levenshtein "
    "distance. Classic DP implementation in both engines -> identical "
    "integer distances.",
    oracle="""
        WITH t AS (SELECT DISTINCT p_type FROM part)
        SELECT a.p_type AS type_a, b.p_type AS type_b,
               CAST(levenshtein(a.p_type, b.p_type) AS INTEGER) AS dist
        FROM t a JOIN t b ON a.p_type < b.p_type
        WHERE levenshtein(a.p_type, b.p_type) <= 6
    """,
    tags=("extended", "string", "fuzzy"),
)
def q58_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "part").select("p_type").distinct()
    a = t.select(F.col("p_type").alias("type_a"))
    b = t.select(F.col("p_type").alias("type_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .withColumn("dist", F.levenshtein("type_a", "type_b"))
        .filter(F.col("dist") <= 6)
    )
