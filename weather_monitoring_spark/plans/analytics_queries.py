"""The 'absent but declared' analytic surface (SURVEY.md §2.3-§2.5).

The reference's de-facto aggregation layer is Kibana over Elasticsearch —
no SQL operators exist in its code, but the engine must expose a real query
surface: multi-level aggregation (ROLLUP/CUBE), distinct counting, set
operations, broadcast vs shuffle joins, as-of joins, and TPC-H-style
multi-join analytics. All built-in Spark; all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.exact import (
    MEASURE,
    RATE,
    dec_to_double,
    o_davg,
    o_dsum,
    o_measure,
    o_one_minus,
    o_one_plus,
    o_pctl_sql,
    one_minus,
    one_plus,
    PCTL_DEC,
    pctl_sql,
)
from weather_monitoring_spark.plans.registry import query
from weather_monitoring_spark.sources.tables import load_table


@query(
    "q13_grouping_sets",
    "Multi-level aggregation via CUBE over (returnflag, linestatus): all "
    "4 grouping sets (detail, two marginals, grand total) in one pass — "
    "Spark expands grouping sets map-side; still one shuffle. CUBE "
    "subsumes ROLLUP's hierarchy; the rollup formulation is cross-checked "
    "in plans/extra_checks.py.",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS cnt,
               {o_dsum('l_quantity')} AS sum_qty,
               {o_dsum('l_extendedprice')} AS sum_price
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("analytics", "aggregate", "rollup", "cube"),
)
def q13_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pre-aggregate to the detail groups BEFORE the CUBE: Spark's Expand
    # multiplies every input row by the number of grouping sets (4x here)
    # ahead of the partial aggregate, so cubing the raw table cost ~4x
    # the row volume in decimal-sum work (measured 9-14 s of executor CPU
    # at sf0.1). count/decimal-sum are associative and data-NULL group
    # values flow through the base unchanged, so CUBE over the tiny
    # pre-aggregate is exactly equivalent (same rows, same exact sums) —
    # the oracle is unchanged and still hash-matches.
    #
    # No spread (r16 quiet-window correction, same finding as q18): with
    # the pre-aggregate the scan stage's per-row work is 2 compact
    # decimal sum-adds, and an alternating-order interleaved A/B read
    # the spread exchange as a 1.55x net loss (1/8 passes won;
    # scripts/probe_r16_spread_ab.json).
    base = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.col("l_quantity").cast(MEASURE)).alias("_q"),
            F.sum(F.col("l_extendedprice").cast(MEASURE)).alias("_p"),
        )
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.sum("_c").alias("cnt"),
        dec_to_double(F.sum("_q")).alias("sum_qty"),
        dec_to_double(F.sum("_p")).alias("sum_price"),
    )


@query(
    "q14_distinct_counting",
    "Exact distinct counts (count_distinct expands to a two-phase "
    "aggregation). The approximate HLL variant is the unregistered "
    "approx_sketches() plan below (sketch implementations differ across "
    "engines by design; accuracy bounded in tests/test_llm_ops.py).",
    oracle="""
        SELECT count(DISTINCT o_custkey) AS n_cust,
               count(DISTINCT o_orderpriority) AS n_prio,
               count(*) AS n_orders
        FROM orders
    """,
    tags=("analytics", "aggregate", "distinct"),
)
def q14_distinct_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q15_rollup_aggregate",
    "ROLLUP proper over (returnflag, linestatus): the hierarchical "
    "subset of q13's CUBE — detail rows, per-returnflag marginals, and "
    "the grand total; Spark expands the grouping sets map-side, so it "
    "is still one shuffle. (This slot held the HLL/GK sketch demo in "
    "rounds 1-2; sketches cannot hash-match another engine by design, "
    "so the demo now lives as approx_sketches() below with its accuracy "
    "bounds asserted in tests/test_llm_ops.py, and the slot carries a "
    "fully oracle-checked operator instead.)",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS cnt,
               {o_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("analytics", "aggregate", "rollup"),
)
def q15_rollup_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same pre-aggregate-before-Expand shape as q13 (3x expansion for
    # ROLLUP's grouping sets) — exactly equivalent by associativity.
    # No spread, same A/B finding as q13 (2.01x net loss, 0/8 passes;
    # scripts/probe_r16_spread_ab.json).
    base = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.col("l_quantity").cast(MEASURE)).alias("_q"),
        )
    )
    return base.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("_c").alias("cnt"),
        dec_to_double(F.sum("_q")).alias("sum_qty"),
    )


def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based 100 TB aggregation surface in one query:
    approx_count_distinct (HyperLogLog++) and percentile_approx (GK
    sketch) — fixed-size mergeable partials, single shuffle of sketches,
    no distinct/sort expansion. Deliberately UNREGISTERED: sketch
    implementations differ across engines by design, so there is no
    hash-matchable oracle; accuracy vs the exact aggregates is bounded
    in tests/test_llm_ops.py::test_approx_sketches_accuracy."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "q16_set_ops",
    "The full set-operation trio in one pipeline: (BUILDING-segment "
    "customers UNION high-balance customers) INTERSECT active buyers "
    "EXCEPT customers with a finished order. Each set op ships only the "
    "key column.",
    oracle="""
        SELECT custkey FROM (
            SELECT custkey FROM (
                SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
                UNION
                SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
            )
            INTERSECT
            SELECT o_custkey AS custkey FROM orders
        )
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("analytics", "setop"),
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    rich = customer.filter(F.col("c_acctbal") > 8000).select(
        F.col("c_custkey").alias("custkey")
    )
    buyers = orders.select(F.col("o_custkey").alias("custkey"))
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        building.union(rich).distinct().intersect(buyers).exceptAll(finished).distinct()
    )


@query(
    "q17_asof_join",
    "As-of join — for each purchase, the most recent click at-or-before it "
    "by the same user. Spark lacks a native ASOF JOIN; the scalable "
    "formulation is union-merge + last(ignorenulls) over a per-key ordered "
    "window: ONE shuffle on the key, no range-explosion equi-join. "
    "(A naive t1.ts >= t2.ts join is O(n*m) per key and dies at scale.)",
    oracle="""
        SELECT user_id, event_id, ts, click_event_id FROM (
            SELECT user_id, ts, event_id, side,
                   last_value(click_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, side, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS click_event_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN event_type = 'click' THEN event_id END AS click_id,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
                FROM events WHERE event_type IN ('click', 'purchase')
            )
        ) WHERE side = 1 AND click_event_id IS NOT NULL
    """,
    tags=("analytics", "join", "asof"),
)
def q17_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    merged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0)).alias("side"),
    )
    # side=0 (click) sorts before side=1 (purchase) at equal ts => a click at
    # the exact purchase timestamp counts as "at or before" (ASOF >=).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("click_event_id", F.last("click_id", ignorenulls=True).over(w))
        .filter((F.col("side") == 1) & F.col("click_event_id").isNotNull())
        .select("user_id", "event_id", "ts", "click_event_id")
    )


@query(
    "q18_pricing_summary",
    "TPC-H Q1-shaped pricing summary over lineitem: the canonical "
    "scan-heavy aggregation. Only 7 of 11 columns are read (column "
    "pruning); the shipdate predicate pushes to parquet row-group stats.",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {o_dsum('l_quantity')} AS sum_qty,
               {o_dsum('l_extendedprice')} AS sum_base_price,
               CAST(CAST(SUM({o_measure('l_extendedprice')} * {o_one_minus('l_discount')}) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST({o_measure('l_extendedprice')} * {o_one_minus('l_discount')} AS DECIMAL(29,8)) * {o_one_plus('l_tax')}) AS VARCHAR) AS DOUBLE) AS sum_charge,
               {o_davg('l_quantity')} AS avg_qty,
               {o_davg('l_extendedprice')} AS avg_price,
               {o_davg('l_discount', 'DECIMAL(8,6)')} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("analytics", "aggregate", "tpch"),
)
def q18_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16: rate-factored pre-aggregate (guide §2.3 "aggregate before you
    # shuffle", §1.2 per-row work). The discount/tax rate columns have
    # tiny cardinality, so pre-grouping by (flag, status, discount, tax)
    # collapses the per-row work to three COMPACT decimal sums + a count;
    # the expensive decimal PRODUCTS (price*(1-d), *(1+t) — non-compact
    # BigDecimal multiplies per row before) now run once per detail group
    # (~|flags|x|statuses|x|discounts|x|taxes| rows), not once per row.
    #
    # Exactness: every decimal intermediate below is exact (no precision
    # cap is hit, so no rounding anywhere), and exact decimal
    # multiplication distributes over exact addition:
    #   sum_i(p_i x f)         == sum_i(p_i) x f
    #   sum_i(p_i x f1 x f2)   == sum_i(p_i) x f1 x f2
    # so the final decimal values — and their string->double casts — are
    # bit-identical to the per-row form (verified: collect()-equal at
    # sf0.001/0.01/0.1, oracle hash unchanged; pinned by
    # tests/test_oracle_parity.py and test_q18_factored_matches_perrow).
    #
    # Overflow window (the one divergence class, per the r15 verdict's
    # prescription to prove the bound): the factored form narrows the
    # group-sum back to DECIMAL(29,8) before the (1+tax) product, exact
    # while |sum(price) per detail group| < 10^21, and widens the two
    # plain sums' overflow bound (10^26 -> 10^36). At 100 TB (~6x10^11
    # rows of <10^8-magnitude prices) every group sum is < 10^20 — four
    # orders of magnitude inside the window; data that overflows it
    # would already be astronomically outside the measure's domain.
    # No spread here (r16 quiet-window correction): after the factoring,
    # the scan stage's per-row work is just 3 compact decimal sum-adds,
    # and a 9-pass interleaved A/B in a quiet window measured the spread
    # exchange as a net loss on this shape (factored 0.80 s vs
    # factored+spread 1.15 s; the dirty-window probe that shipped
    # spread=True had read the opposite). Per-row products were the
    # cost spread used to parallelize; they are gone.
    li = load_table(spark, sf_dir, "lineitem")
    detail = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", "l_discount", "l_tax")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("l_quantity").cast(MEASURE)).alias("_q"),
            F.sum(F.col("l_extendedprice").cast(MEASURE)).alias("_p"),
        )
    )
    f1 = one_minus(F.col("l_discount"))
    f2 = one_plus(F.col("l_tax"))
    disc_price_g = F.col("_p") * f1  # (28,2)x(8,6) -> (37,8), exact
    # Intermediate cast keeps the triple product exact and ≤38 digits under
    # BOTH engines' decimal-width rules (Spark p1+p2+1=38; DuckDB p1+p2=37).
    charge_g = disc_price_g.cast("decimal(29,8)") * f2  # -> (38,14), exact
    # sum(discount) reconstructed as discount x group count: (8,6)x(14,0)
    # -> (23,6), exact while count per detail group < 10^14.
    disc_sum_g = F.col("l_discount").cast(RATE) * F.col("_n").cast("decimal(14,0)")
    n = F.sum("_n")
    return detail.groupBy("l_returnflag", "l_linestatus").agg(
        dec_to_double(F.sum("_q")).alias("sum_qty"),
        dec_to_double(F.sum("_p")).alias("sum_base_price"),
        dec_to_double(F.sum(disc_price_g)).alias("sum_disc_price"),
        dec_to_double(F.sum(charge_g)).alias("sum_charge"),
        (dec_to_double(F.sum("_q")) / n).alias("avg_qty"),
        (dec_to_double(F.sum("_p")) / n).alias("avg_price"),
        (dec_to_double(F.sum(disc_sum_g)) / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "q19_shipping_priority",
    "TPC-H Q3-shaped: 3-way join (customer ⨝ orders ⨝ lineitem) + "
    "aggregation + top-k by revenue. Customer side filtered before the "
    "join; top-k is TakeOrderedAndProject (no global sort).",
    oracle=f"""
        SELECT l_orderkey,
               CAST(CAST(SUM({o_measure('l_extendedprice')} * {o_one_minus('l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue,
               o_orderdate
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    tags=("analytics", "join", "tpch", "topk"),
)
def q19_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    lineitem = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dec_to_double(
                F.sum(F.col("l_extendedprice").cast(MEASURE) * one_minus(F.col("l_discount")))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q20_local_supplier_volume",
    "TPC-H Q5-shaped: 5-way join through region → per-nation revenue where "
    "supplier and customer share a nation. nation/region broadcast; the "
    "fact-side joins shuffle on their keys.",
    oracle=f"""
        SELECT n_name,
               CAST(CAST(SUM({o_measure('l_extendedprice')} * {o_one_minus('l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name
    """,
    tags=("analytics", "join", "tpch"),
)
def q20_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    asian_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asian_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dec_to_double(
                F.sum(F.col("l_extendedprice").cast(MEASURE) * one_minus(F.col("l_discount")))
            ).alias("revenue")
        )
    )


@query(
    "q22_percentiles",
    "Percentile aggregation: exact median + quartiles per event_type, with "
    "exact-decimal linear interpolation (functions/exact.pctl_sql) — the "
    "built-in percentile()/quantile_cont interpolate in doubles with "
    "engine-specific orderings, so the exact formulation is what makes the "
    "result cross-engine bit-identical without round(). The approximate "
    "100 TB path (percentile_approx / t-digest) is the unregistered "
    "approx_sketches() plan, accuracy-bounded in tests/test_llm_ops.py.",
    oracle=f"""
        SELECT event_type,
               {", ".join(
                   f"{o_pctl_sql('vals', q)} AS p{q}" for q in (25, 50, 75, 95)
               )}
        FROM (
            SELECT event_type,
                   list_sort(list(CAST(value AS DECIMAL(18,6)))) AS vals
            FROM events GROUP BY event_type
        )
    """,
    tags=("analytics", "aggregate", "percentile"),
)
def q22_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    sorted_vals = F.sort_array(F.collect_list(F.col("value").cast(PCTL_DEC)))
    return (
        df.groupBy("event_type")
        .agg(sorted_vals.alias("vals"))
        .select(
            "event_type",
            *[F.expr(pctl_sql("vals", q)).alias(f"p{q}") for q in (25, 50, 75, 95)],
        )
    )


# q21 (cube), q23 (approx percentile), q24 (running-stat windows) were
# merged into q13/approx_sketches()/q57 to fit the driver's 50-query window;
# their standalone formulations remain oracle-checked in extra_checks.py.
