#!/usr/bin/env python
"""Microbench of shingle-explode pipeline variants (the map-side cost
under q30/q31/q32/q50). Asserts each variant's exploded (id, s) multiset
EXACTLY equals the current one on sf0.01 and sf0.1, then times the
exploded count at sf0.1.

Variants:
  A current: filter() HOF tokens + transform() HOF shingles + array_distinct
  B codegen tokens (edge-strip regexp + split), HOF shingles
  C codegen tokens + arrays_zip/slice shingle structs + array_distinct

Usage: python scripts/probe_r15_shingle.py [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import (
    SHINGLE_N,
    TOKEN_SPLIT_RE,
    shingles_expr,
    tokens_expr,
)
from weather_monitoring_spark.session import get_spark
from weather_monitoring_spark.sources.tables import load_table

TOK_CG = (
    f"split(regexp_replace(lower(text), '^(?:{TOKEN_SPLIT_RE})|(?:{TOKEN_SPLIT_RE})$', ''), "
    f"'{TOKEN_SPLIT_RE}')"
)


def sh_current(docs: DataFrame) -> DataFrame:
    return docs.withColumn("_tk", tokens_expr("text")).select(
        F.col("doc_id").alias("id"), F.explode(shingles_expr("_tk")).alias("s")
    )


def sh_b(docs: DataFrame) -> DataFrame:
    return docs.selectExpr(f"doc_id AS id", f"{TOK_CG} AS _tk").select(
        F.col("id"), F.explode(shingles_expr("_tk")).alias("s")
    )


def sh_c(docs: DataFrame) -> DataFrame:
    z = (
        "arrays_zip(slice(_tk, 1, size(_tk) - 2), "
        "slice(_tk, 2, size(_tk) - 2), slice(_tk, 3, size(_tk) - 2))"
    )
    return (
        docs.selectExpr("doc_id AS id", f"{TOK_CG} AS _tk")
        .selectExpr(
            "id",
            f"CASE WHEN size(_tk) >= {SHINGLE_N} THEN array_distinct({z}) "
            "ELSE CAST(array() AS array<struct<`0`:string,`1`:string,`2`:string>>) END AS _z",
        )
        .select(F.col("id"), F.explode("_z").alias("zz"))
        .selectExpr("id", "concat_ws(' ', zz.`0`, zz.`1`, zz.`2`) AS s")
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="wms-shingle")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"A": sh_current, "B": sh_b, "C": sh_c}

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load_table(spark, sf, "documents", spread=True)
        base = sorted(map(tuple, sh_current(docs).collect()))
        for k in ("B", "C"):
            got = sorted(map(tuple, variants[k](docs).collect()))
            assert got == base, f"{k}@{sf}: mismatch {len(got)} vs {len(base)}"
        print(f"equal at {sf}: {len(base)} rows", file=sys.stderr)

    docs = load_table(spark, "/root/testdata/sf0.1", "documents", spread=True)
    out = {}
    for k, fn in variants.items():
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[k] = {"median": statistics.median(ts), "runs": ts}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
