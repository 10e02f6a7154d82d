#!/usr/bin/env python
"""Interleaved A/B of candidate r16 rewrites against the shipped plans.

Variants are built INLINE (no engine edits needed to measure), executed
to the noop sink in interleaved passes; medians per variant. Interleaving
makes the comparison window-immune: a host-throttle spike lands on one
pass of every variant instead of all passes of one.

Usage: python scripts/probe_r16_qvariants.py [runs] [variant ...]
Writes scripts/probe_r16_qvariants.json (merging over prior runs).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from weather_monitoring_spark.functions.exact import (  # noqa: E402
    MEASURE,
    RATE,
    davg,
    dec_to_double,
    dsum,
    one_minus,
    one_plus,
)
from weather_monitoring_spark.session import get_spark  # noqa: E402
from weather_monitoring_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


# --------------------------- q18 variants ---------------------------

def q18_current(spark, sf_dir):
    from weather_monitoring_spark.plans.registry import all_queries

    return all_queries()["q18_pricing_summary"].spark(spark, sf_dir)


def _q18_body(li):
    price = F.col("l_extendedprice").cast(MEASURE)
    disc_price = price * one_minus(F.col("l_discount"))
    charge = disc_price.cast("decimal(29,8)") * one_plus(F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dec_to_double(F.sum(disc_price)).alias("sum_disc_price"),
            dec_to_double(F.sum(charge)).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount"), RATE).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q18_perrow(spark, sf_dir):
    """The r15 registry shape: per-row decimal products, no spread."""
    return _q18_body(load_table(spark, sf_dir, "lineitem"))


def q18_spread(spark, sf_dir):
    return _q18_body(load_table(spark, sf_dir, "lineitem", spread=True))


def _q18_factored(li):
    """Rate-factored: pre-aggregate by (flag, status, discount, tax) —
    the rate columns are tiny-cardinality — then apply the decimal
    products ONCE PER DETAIL GROUP (exact by distributivity)."""
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
    disc_price_g = F.col("_p") * f1
    charge_g = disc_price_g.cast("decimal(29,8)") * f2
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


def q18_factored(spark, sf_dir):
    return _q18_factored(load_table(spark, sf_dir, "lineitem"))


def q18_factored_spread(spark, sf_dir):
    return _q18_factored(load_table(spark, sf_dir, "lineitem", spread=True))


# --------------------------- q32 variants ---------------------------

def q32_current(spark, sf_dir):
    from weather_monitoring_spark.plans.registry import all_queries

    return all_queries()["q32_ngram_jaccard_pairs"].spark(spark, sf_dir)


def q32_sizes_pin(spark, sf_dir):
    """ngram_jaccard_pairs with the per-doc size aggregate computed ONCE
    (pinned) instead of once per join leg (the r15 after-plan computes
    the identical groupBy(id).count() subtree twice, ops 11-16/20-25)."""
    from weather_monitoring_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _filtered_shingles,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = _filtered_shingles(docs, "doc_id", "text", "auto")
    sizes = (
        sh.groupBy("id").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    )
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") * F.lit(1.0) / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b", "shared", "jaccard")
    )


def q32_df2(spark, sf_dir):
    """ngram_jaccard_pairs with the self-join input pre-filtered to
    shingles of document frequency >= 2: a df=1 shingle can never
    produce a pair (the join needs two docs), so dropping those rows
    from BOTH join legs leaves `shared` — and sizes, computed from the
    full filtered universe — bit-identical while shrinking the join
    input to the duplicate-shingle minority."""
    from weather_monitoring_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _filtered_shingles,
        _jaccard_from_shared,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = _filtered_shingles(docs, "doc_id", "text", "auto")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    multi = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("s")
    )
    shj = sh.join(F.broadcast(multi), "s", "left_semi")
    a, b = shj.alias("a"), shj.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return _jaccard_from_shared(shared, sizes, JACCARD_THRESHOLD)


def q31_df2(spark, sf_dir):
    """minhash_lsh_pairs with the cold-bucket self-join input restricted
    to buckets of occupancy in [2, cut] via ONE semi-join against the
    already-computed bucket-df aggregate (replacing the anti-join vs
    hot): single-occupancy buckets produce no pairs, so the pair set is
    identical."""
    from weather_monitoring_spark.functions.text import h60_from_md5_sql
    from weather_monitoring_spark.operators.dedup import (
        BAND_DF_MIN,
        LSH_BANDS,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    sigs = minhash_signatures(docs)
    bands = sigs.selectExpr(
        "doc_id AS id",
        f"{h60_from_md5_sql('md5(sig)')} AS fp",
        "posexplode(array("
        + ", ".join(f"band_{b}" for b in range(LSH_BANDS))
        + ")) AS (band_idx, bh)",
    ).localCheckpoint(eager=False)

    bdf = bands.groupBy("band_idx", "bh").agg(F.count(F.lit(1)).alias("df"))
    cut = docs.agg(
        F.greatest(
            F.lit(BAND_DF_MIN).cast("long"),
            F.ceil(F.sqrt(F.count(F.lit(1)))),
        ).alias("_cut")
    )
    bdfc = bdf.crossJoin(F.broadcast(cut)).localCheckpoint(eager=False)
    hot = bdfc.filter(F.col("df") > F.col("_cut")).select("band_idx", "bh")
    multi_cold = bdfc.filter(
        (F.col("df") >= 2) & (F.col("df") <= F.col("_cut"))
    ).select("band_idx", "bh")
    hot = hot.localCheckpoint(eager=False)
    cold = bands.join(F.broadcast(multi_cold), ["band_idx", "bh"], "left_semi")
    members = (
        bands.join(F.broadcast(hot), ["band_idx", "bh"], "left_semi")
        .select("id", "fp")
        .distinct()
    )
    keepers = members.groupBy("fp").agg(F.min("id").alias("_keeper"))
    hot_pairs = (
        members.join(keepers, "fp")
        .filter(F.col("id") > F.col("_keeper"))
        .select(F.col("_keeper").alias("id_a"), F.col("id").alias("id_b"))
    )
    a, b = cold.alias("a"), cold.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    return pairs.unionByName(hot_pairs).distinct()


def q31_current(spark, sf_dir):
    from weather_monitoring_spark.plans.registry import all_queries

    return all_queries()["q31_minhash_lsh_pairs"].spark(spark, sf_dir)


# --------------------------- q43 variants ---------------------------

def q43_current(spark, sf_dir):
    from weather_monitoring_spark.plans.registry import all_queries

    return all_queries()["q43_salted_aggregate"].spark(spark, sf_dir)


def q43_unsalted(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("string").cast("double").alias("sum_value"),
    )


# --------------------------- q37 variants ---------------------------

def q37_current(spark, sf_dir):
    from weather_monitoring_spark.plans.registry import all_queries

    return all_queries()["q37_ann_lsh_topk"].spark(spark, sf_dir)


def q37_pinned(spark, sf_dir):
    from weather_monitoring_spark.operators.similarity import ann_lsh_topk
    from weather_monitoring_spark.plans.llm_queries import QUERY_VEC_IDS

    emb = load_table(
        spark, sf_dir, "embeddings", spread=True, pin=("vec_id", "embedding")
    )
    return ann_lsh_topk(emb, QUERY_VEC_IDS)


VARIANTS = {
    "q18_current": q18_current,
    "q18_perrow": q18_perrow,
    "q18_spread": q18_spread,
    "q18_factored": q18_factored,
    "q18_factored_spread": q18_factored_spread,
    "q32_current": q32_current,
    "q32_sizes_pin": q32_sizes_pin,
    "q32_df2": q32_df2,
    "q31_current": q31_current,
    "q31_df2": q31_df2,
    "q43_current": q43_current,
    "q43_unsalted": q43_unsalted,
    "q37_current": q37_current,
    "q37_pinned": q37_pinned,
}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or list(VARIANTS)
    spark = get_spark(app_name="wms-r16-variants")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm every plan shape once at the tiny SF.
    for n in names:
        try:
            VARIANTS[n](spark, WARM).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warm {n} failed: {e}", file=sys.stderr)

    t: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            spark.sparkContext.setJobDescription(f"r16var:{n}")
            t0 = time.perf_counter()
            try:
                VARIANTS[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                t[n].append(round(time.perf_counter() - t0, 4))
            except Exception as e:
                print(f"{n} failed: {e}", file=sys.stderr)
                t[n].append(-1.0)
    out = {
        n: {
            "median": round(statistics.median([x for x in ts if x >= 0] or [-1]), 4),
            "samples": ts,
        }
        for n, ts in t.items()
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_r16_qvariants.json")
    prior = {}
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
    prior.update(out)
    with open(path, "w") as f:
        json.dump(prior, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
