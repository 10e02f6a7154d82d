"""Mirror of the driver's t2 gate: every oracle-bearing registry query must
hash-match DuckDB on the same parquet tables (sf0.001 for speed; the driver
runs sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import compare_query
from weather_monitoring_spark.plans.extra_checks import EXTRA_SPECS
from weather_monitoring_spark.plans.registry import all_queries

#: The driver's correctness gate covers only the first 50 registered
#: queries — the registry must fit entirely inside that window.
DRIVER_QUERY_WINDOW = 50

SPECS = [s for s in all_queries().values() if s.oracle is not None] + EXTRA_SPECS
NO_ORACLE = [s for s in all_queries().values() if s.oracle is None]


def test_registry_fits_driver_window():
    assert len(all_queries()) <= DRIVER_QUERY_WINDOW, (
        f"registry has {len(all_queries())} queries; only the first "
        f"{DRIVER_QUERY_WINDOW} get driver verdicts — merge or move to "
        "extra_checks.py"
    )


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, spec):
    compare_query(spark, spec, SF_SMALL)


@pytest.mark.parametrize("spec", NO_ORACLE, ids=[s.name for s in NO_ORACLE])
def test_rows_only_queries_run(spark, spec):
    df = spec.spark(spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_ivf_topk_recall_oracle_vs_duckdb(spark):
    """The IVF ANN path's cross-engine recall oracle, mirroring q37's
    standing for LSH: the k-means index itself is not SQL-expressible, so
    DuckDB provides (a) the exact brute-force top-k baseline and (b) the
    exact cosine for every pair IVF returns. Assertions: every IVF score
    bit-matches DuckDB's sequential fold (float hex, no tolerance),
    recall@10 vs the DuckDB baseline clears 0.5, and the whole pipeline
    is deterministic (repeat run returns the identical rows — the recall
    number is a stable property of the data, not of an RNG)."""
    from tests.oracle_harness import duck_connection
    from weather_monitoring_spark.operators.similarity import ivf_topk
    from weather_monitoring_spark.plans.llm_queries import _o_cosine
    from weather_monitoring_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = [0, 1, 2, 3, 4]
    k = 10
    rows = ivf_topk(emb, qids, k=k).collect()

    con = duck_connection(SF_SMALL)
    try:
        exact = con.sql(f"""
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qvec FROM embeddings
                WHERE vec_id IN ({", ".join(map(str, qids))})
            ), scored AS (
                SELECT qid, vec_id, {_o_cosine('embedding', 'qvec')} AS cosine,
                       row_number() OVER (
                           PARTITION BY qid
                           ORDER BY {_o_cosine('embedding', 'qvec')} DESC, vec_id
                       ) AS rnk
                FROM embeddings, q WHERE vec_id <> qid
            )
            SELECT qid, vec_id, cosine FROM scored WHERE rnk <= {k}
        """).fetchall()
        pairs = [(r.qid, r.vec_id) for r in rows]
        pair_sql = ", ".join(f"({a}, {b})" for a, b in pairs)
        returned = con.sql(f"""
            WITH p(qid, vid) AS (VALUES {pair_sql})
            SELECT p.qid, p.vid, {_o_cosine('a.embedding', 'b.embedding')} AS cosine
            FROM p JOIN embeddings a ON a.vec_id = p.qid
                   JOIN embeddings b ON b.vec_id = p.vid
        """).fetchall()
    finally:
        con.close()

    duck_cos = {(q, v): c for q, v, c in returned}
    for r in rows:
        assert r.cosine.hex() == duck_cos[(r.qid, r.vec_id)].hex(), (
            f"IVF cosine for {(r.qid, r.vec_id)} diverges from DuckDB"
        )
    exact_keys = {(q, v) for q, v, _ in exact}
    recall = len(exact_keys & set(pairs)) / len(exact_keys)
    assert recall >= 0.5, f"recall@{k} vs DuckDB exact baseline: {recall}"
    rows2 = ivf_topk(emb, qids, k=k).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_ivf_pq_topk_recall_oracle_vs_duckdb(spark):
    """The IVF + int8-coarse-scan composition under the same cross-engine
    harness as plain IVF: every returned cosine must bit-match DuckDB's
    sequential fold (quantization is only allowed to affect WHICH
    candidates reach exact re-scoring, never the reported score), its
    recall@10 vs the DuckDB brute-force baseline clears 0.5, the
    pipeline is deterministic, and the quantized coarse ranking costs at
    most a small recall delta vs plain IVF on this corpus (the shortlist
    absorbs int8 jitter)."""
    from tests.oracle_harness import duck_connection
    from weather_monitoring_spark.operators.similarity import ivf_pq_topk, ivf_topk
    from weather_monitoring_spark.plans.llm_queries import _o_cosine
    from weather_monitoring_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = [0, 1, 2, 3, 4]
    k = 10
    rows = ivf_pq_topk(emb, qids, k=k).collect()

    con = duck_connection(SF_SMALL)
    try:
        exact = con.sql(f"""
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qvec FROM embeddings
                WHERE vec_id IN ({", ".join(map(str, qids))})
            ), scored AS (
                SELECT qid, vec_id, {_o_cosine('embedding', 'qvec')} AS cosine,
                       row_number() OVER (
                           PARTITION BY qid
                           ORDER BY {_o_cosine('embedding', 'qvec')} DESC, vec_id
                       ) AS rnk
                FROM embeddings, q WHERE vec_id <> qid
            )
            SELECT qid, vec_id, cosine FROM scored WHERE rnk <= {k}
        """).fetchall()
        pairs = [(r.qid, r.vec_id) for r in rows]
        pair_sql = ", ".join(f"({a}, {b})" for a, b in pairs)
        returned = con.sql(f"""
            WITH p(qid, vid) AS (VALUES {pair_sql})
            SELECT p.qid, p.vid, {_o_cosine('a.embedding', 'b.embedding')} AS cosine
            FROM p JOIN embeddings a ON a.vec_id = p.qid
                   JOIN embeddings b ON b.vec_id = p.vid
        """).fetchall()
    finally:
        con.close()

    duck_cos = {(q, v): c for q, v, c in returned}
    for r in rows:
        assert r.cosine.hex() == duck_cos[(r.qid, r.vec_id)].hex(), (
            f"IVF+PQ cosine for {(r.qid, r.vec_id)} diverges from DuckDB"
        )
    exact_keys = {(q, v) for q, v, _ in exact}
    recall = len(exact_keys & set(pairs)) / len(exact_keys)
    assert recall >= 0.5, f"recall@{k} vs DuckDB exact baseline: {recall}"
    ivf_keys = {(r.qid, r.vec_id) for r in ivf_topk(emb, qids, k=k).collect()}
    ivf_recall = len(exact_keys & ivf_keys) / len(exact_keys)
    assert recall >= ivf_recall - 0.1, (
        f"quantized coarse scan lost too much recall: {recall} vs IVF {ivf_recall}"
    )
    rows2 = ivf_pq_topk(emb, qids, k=k).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_q18_factored_matches_perrow(spark):
    """r16: q18's rate-factored pre-aggregate must be bit-identical to
    the per-row decimal-product form it replaced — on the testdata AND
    on a synthetic frame that exercises the full rate domain (every
    (discount, tax) at 6 decimals, prices at 2, duplicate groups, a
    group whose discount is exactly 1.0 so (1-d) = 0). Exactness rests
    on distributivity of exact decimal multiplication over exact
    addition; this pins it empirically."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.functions.exact import (
        MEASURE,
        RATE,
        davg,
        dec_to_double,
        dsum,
        one_minus,
        one_plus,
    )
    from weather_monitoring_spark.plans.registry import all_queries

    def perrow(li):
        price = F.col("l_extendedprice").cast(MEASURE)
        disc_price = price * one_minus(F.col("l_discount"))
        charge = disc_price.cast("decimal(29,8)") * one_plus(F.col("l_tax"))
        return (
            li.filter(
                F.col("l_shipdate")
                <= F.lit("1998-09-02 00:00:00").cast("timestamp")
            )
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

    # 1) real testdata
    factored = all_queries()["q18_pricing_summary"].spark(spark, SF_SMALL)
    from weather_monitoring_spark.sources.tables import load_table

    reference = perrow(load_table(spark, SF_SMALL, "lineitem"))
    assert {tuple(r) for r in factored.collect()} == {
        tuple(r) for r in reference.collect()
    }

    # 2) synthetic adversarial frame: md5-derived 6-decimal rates (full
    # RATE scale), 2-decimal prices, fractional quantities, repeated
    # (flag, status, d, t) groups, and d = 1.0 (zero factor).
    syn = spark.range(4000).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'A' ELSE 'R' END AS l_returnflag",
        "CASE WHEN id % 2 = 0 THEN 'F' ELSE 'O' END AS l_linestatus",
        "CAST(CAST(conv(substring(md5(concat('p', id)), 1, 8), 16, 10) AS BIGINT) % 10000000 AS DOUBLE) / 100 AS l_extendedprice",
        "CAST(CAST(conv(substring(md5(concat('q', id)), 1, 8), 16, 10) AS BIGINT) % 5000 AS DOUBLE) / 100 AS l_quantity",
        "CASE WHEN id % 97 = 0 THEN CAST(1.0 AS DOUBLE) ELSE "
        "CAST(CAST(conv(substring(md5(concat('d', id % 23)), 1, 8), 16, 10) AS BIGINT) % 1000000 AS DOUBLE) / 1000000 END AS l_discount",
        "CAST(CAST(conv(substring(md5(concat('t', id % 17)), 1, 8), 16, 10) AS BIGINT) % 1000000 AS DOUBLE) / 1000000 AS l_tax",
        "CAST('1998-01-01 00:00:00' AS TIMESTAMP) AS l_shipdate",
    )
    from weather_monitoring_spark.plans.analytics_queries import (
        q18_pricing_summary,
    )

    # re-apply the registered builder's aggregate shape to the synthetic
    # frame by routing through a temp view is overkill: inline the same
    # factored expressions via the module's own code path by monkeypatch-
    # free construction — the builder only differs in its load_table
    # source, so rebuild both shapes here.
    detail = (
        syn.groupBy("l_returnflag", "l_linestatus", "l_discount", "l_tax")
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
    syn_factored = detail.groupBy("l_returnflag", "l_linestatus").agg(
        dec_to_double(F.sum("_q")).alias("sum_qty"),
        dec_to_double(F.sum("_p")).alias("sum_base_price"),
        dec_to_double(F.sum(disc_price_g)).alias("sum_disc_price"),
        dec_to_double(F.sum(charge_g)).alias("sum_charge"),
        (dec_to_double(F.sum("_q")) / n).alias("avg_qty"),
        (dec_to_double(F.sum("_p")) / n).alias("avg_price"),
        (dec_to_double(F.sum(disc_sum_g)) / n).alias("avg_disc"),
        n.alias("count_order"),
    )
    sf = {tuple(r) for r in syn_factored.collect()}
    sp = {tuple(r) for r in perrow(syn).collect()}
    assert sf == sp, f"synthetic divergence: {sorted(sf - sp)[:2]} vs {sorted(sp - sf)[:2]}"
