"""Bucketed storage: the co-located join must plan without any Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from weather_monitoring_spark.sources.tables import load_table
from weather_monitoring_spark.storage.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)


def test_bucketed_join_drops_exchange(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"])
    try:
        assert bucketed_join_is_shuffle_free(spark, "b_orders", "b_lineitem", "o_orderkey")
        # and the result is right
        n = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey").count()
        expected = orders.join(lineitem, "o_orderkey").count()
        assert n == expected
        # contrast: the same join over plain (non-bucketed) parquet
        # shuffles both sides under the same no-broadcast planning
        orders.write.mode("overwrite").saveAsTable("p_orders")
        lineitem.write.mode("overwrite").saveAsTable("p_lineitem")
        from weather_monitoring_spark.storage.bucketing import join_shuffle_exchanges
        assert join_shuffle_exchanges(spark, "p_orders", "p_lineitem", "o_orderkey") >= 2
    finally:
        for t in ("b_orders", "b_lineitem", "p_orders", "p_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
