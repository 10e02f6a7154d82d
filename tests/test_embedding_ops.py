"""Unit tests for operators/embeddings.py::reduce_embeddings — GEMM vs
expr path agreement, determinism, and the JL distance-preservation
property on the fixture corpus. (Cross-engine oracle parity runs in
test_oracle_parity via the x_reduce_embeddings extra.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from weather_monitoring_spark.operators.embeddings import (
    JL_DIM,
    jl_matrix,
    reduce_embeddings,
)
from weather_monitoring_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_gemm_and_expr_paths_agree_to_float_noise(spark):
    emb = load_table(spark, SF, "embeddings")
    a = {r["vec_id"]: r["reduced"] for r in reduce_embeddings(emb, method="gemm").collect()}
    b = {r["vec_id"]: r["reduced"] for r in reduce_embeddings(emb, method="expr").collect()}
    assert set(a) == set(b) and len(a) > 0
    worst = max(
        abs(x - y) for vid in a for x, y in zip(a[vid], b[vid])
    )
    # numpy pairwise summation vs left-associated chain: ulp-scale noise only
    assert worst < 1e-9, worst


def test_reduce_is_deterministic_and_shaped(spark):
    emb = load_table(spark, SF, "embeddings")
    r1 = sorted(reduce_embeddings(emb).collect())
    r2 = sorted(reduce_embeddings(emb).collect())
    assert r1 == r2
    assert all(len(r["reduced"]) == JL_DIM for r in r1)


def test_jl_preserves_norms_in_expectation(spark):
    # ||Px||^2 concentrates around ||x||^2 — check the mean ratio over the
    # corpus lands well inside the JL concentration band.
    emb = load_table(spark, SF, "embeddings")
    red = reduce_embeddings(emb, method="gemm")
    joined = emb.join(red, "vec_id").select(
        F.expr("aggregate(embedding, 0.0D, (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))").alias("n2"),
        F.expr("aggregate(reduced, 0.0D, (a, v) -> a + v * v)").alias("r2"),
    )
    row = joined.agg(F.avg(F.col("r2") / F.col("n2"))).first()
    assert 0.7 < row[0] < 1.3, row[0]


def test_jl_matrix_is_signs_only():
    m = jl_matrix(8, 16)
    assert set(m.flatten().tolist()) == {1.0, -1.0}


def test_jl_shortlist_plus_exact_rescore_recall(spark):
    # The composition the reduction exists for: shortlist on 32-dim
    # reduced vectors (2x fewer bytes per score), exact re-score on the
    # full 64-dim vectors, compare against exact full-dim top-10. The
    # whole pipeline is deterministic (md5 planes, id tie-breaks), so the
    # measured recall is a constant of the fixture, not a flaky sample.
    # This fixture is near-uniform random — cosine gaps at rank 10 are
    # small relative to JL distortion at k=32, the worst regime for a
    # projected shortlist — so the bound is deliberately the measured
    # floor (clustered real-world embeddings sit far above it; compare
    # the IVF operator's documented recall@10 = 0.56 at a 25% scan).
    from weather_monitoring_spark.operators.similarity import cosine_topk

    emb = load_table(spark, SF, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=10)

    red = reduce_embeddings(emb, out_dim=32, method="gemm").withColumnRenamed(
        "reduced", "embedding"
    )
    shortlist = cosine_topk(red, qids, k=100)
    cand = shortlist.select("qid", "vec_id").join(emb, "vec_id")
    # exact re-score of shortlist candidates against full-dim queries
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    from weather_monitoring_spark.operators.similarity import dot_expr, norm_expr
    from pyspark.sql import Window

    rescored = (
        cand.join(F.broadcast(queries), "qid")
        .withColumn(
            "cosine",
            dot_expr("embedding", "qvec") / (norm_expr("embedding") * norm_expr("qvec")),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
            ),
        )
        .filter(F.col("rank") <= 10)
    )
    truth = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    got = {(r["qid"], r["vec_id"]) for r in rescored.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, recall
