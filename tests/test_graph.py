"""Unit tests for operators/graph.py — connected components and
transitive survivor selection. (Cross-engine parity of the composed
pipeline runs via x_dedup_clusters in test_oracle_parity.)"""

from __future__ import annotations

from weather_monitoring_spark.operators.graph import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")


def test_chain_collapses_to_one_component(spark):
    # 0-1, 1-2, 2-3: transitive closure even though (0,3) is no pair.
    comp = {
        r["node"]: r["component"]
        for r in connected_components(_edges(spark, [(0, 1), (1, 2), (2, 3)])).collect()
    }
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0}


def test_disjoint_components_keep_separate_labels(spark):
    comp = {
        r["node"]: r["component"]
        for r in connected_components(
            _edges(spark, [(1, 5), (5, 9), (20, 21), (30, 31), (31, 30)])
        ).collect()
    }
    assert comp[1] == comp[5] == comp[9] == 1
    assert comp[20] == comp[21] == 20
    assert comp[30] == comp[31] == 30


def test_long_chain_converges_within_iteration_cap(spark):
    # 64-node path graph: diameter 63, but pointer jumping converges in
    # O(log n) rounds — well inside CC_MAX_ITER=30.
    n = 64
    comp = connected_components(_edges(spark, [(i, i + 1) for i in range(n - 1)]))
    rows = comp.collect()
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)


def test_dedup_clusters_one_survivor_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    # cluster {1,3,5} via chain, cluster {6,7}; 0,2,4 isolated.
    out = {r["doc_id"]: r for r in dedup_clusters(docs, _edges(spark, [(1, 3), (3, 5), (6, 7)])).collect()}
    assert out[1]["cluster"] == out[3]["cluster"] == out[5]["cluster"] == 1
    assert [out[i]["survivor"] for i in (1, 3, 5)] == [True, False, False]
    assert out[6]["cluster"] == 6 and out[6]["survivor"] and not out[7]["survivor"]
    for i in (0, 2, 4):
        assert out[i]["cluster"] == i and out[i]["survivor"]
    survivors = [r for r in out.values() if r["survivor"]]
    assert len(survivors) == 5  # 2 cluster reps + 3 isolated


def test_quality_survivors_keep_best_copy_not_min_id(spark):
    """In a 3-doc chain cluster {1,2,3}, doc 2 has the highest quality ->
    it survives (min-id dedup_clusters would keep 1). Quality ties break
    toward the smaller id; singletons survive trivially."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.graph import quality_survivors

    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest best copy"), (3, "mid copy"),
         (4, "singleton"), (5, "tie a"), (6, "tie b")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r for r in quality_survivors(
        docs, pairs, F.length("text")
    ).collect()}
    assert len(out) == 6  # every doc gets a verdict
    assert {r.cluster for r in out.values() if r.doc_id in (1, 2, 3)} == {1}
    assert out[2].survivor and not out[1].survivor and not out[3].survivor
    assert out[4].survivor  # singleton
    # equal quality (len("tie a") == len("tie b")) -> smaller id survives
    assert out[5].survivor and not out[6].survivor
    # exactly one survivor per cluster
    from collections import Counter

    per_cluster = Counter(r.cluster for r in out.values() if r.survivor)
    assert all(v == 1 for v in per_cluster.values())
    assert len(per_cluster) == 3


# ---------------- leakage-safe split -------------------------------------

from pyspark.sql import functions as F

from weather_monitoring_spark.operators.graph import leakage_safe_split


def _docs_ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_split_keeps_clusters_together_and_closes_the_id_hash_leak(spark):
    # 50 planted near-dup pairs (2k, 2k+1) among 200 docs.
    docs = _docs_ids(spark, 200)
    pairs = _edges(spark, [(2 * k, 2 * k + 1) for k in range(50)])
    out = leakage_safe_split(docs, pairs).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    for k in range(50):
        assert split[2 * k] == split[2 * k + 1]
    # the per-document q59-style hash split WOULD separate at least one
    # planted pair (deterministic md5 — this documents the leak the
    # cluster-hash split closes).
    id_bucket = (
        docs.select(
            "doc_id",
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),"
                " ':split')), 1, 8), 16, 10) AS BIGINT) % 100"
            ).alias("b"),
        )
        .toPandas()
        .set_index("doc_id")["b"]
    )
    def tier(b):
        return "train" if b < 80 else ("val" if b < 90 else "test")
    leaked = [
        k for k in range(50)
        if tier(id_bucket[2 * k]) != tier(id_bucket[2 * k + 1])
    ]
    assert leaked, "expected the id-hash split to separate some pair"


def test_split_fractions_and_determinism(spark):
    docs = _docs_ids(spark, 500)
    pairs = _edges(spark, [])
    a = leakage_safe_split(docs, pairs).orderBy("doc_id").collect()
    b = (
        leakage_safe_split(docs.repartition(13), pairs)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b  # partitioning-independent assignment
    counts = {}
    for r in a:
        assert 0 <= r["bucket"] < 100
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    # 80/10/10 within loose bounds on 500 singletons
    assert counts["train"] > 300 and counts["val"] > 10 and counts["test"] > 10


# ---------------- deterministic PageRank -----------------------------------


def test_pagerank_hub_ranks_highest_and_mass_flows(spark):
    from weather_monitoring_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank,
    )

    edges = [(i, 99) for i in range(1, 20)] + [(99, 1)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = {r["node"]: r for r in pagerank(e, iterations=4).collect()}
    ranks = sorted(out.values(), key=lambda r: -r["rank_int"])
    # the star hub and its sole beneficiary dominate the leaves
    assert {ranks[0]["node"], ranks[1]["node"]} == {99, 1}
    leaf = out[5]
    assert ranks[0]["rank_int"] > 3 * leaf["rank_int"]
    # rank is exactly rank_int / 2^40 (the only float)
    for r in out.values():
        assert r["rank"] == r["rank_int"] / PAGERANK_SCALE


def test_pagerank_is_partitioning_invariant_bit_for_bit(spark):
    """The determinism claim itself: scaled-int64 arithmetic makes the
    contribution sums order-free, so 3-partition and 17-partition runs
    produce IDENTICAL rank_int — float PageRank cannot promise this."""
    from weather_monitoring_spark.operators.graph import pagerank

    edges = [(i, (i * 7 + 3) % 50) for i in range(200)] + [
        (i, (i * 13 + 1) % 50) for i in range(200)
    ]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = {
        r["node"]: r["rank_int"]
        for r in pagerank(e.repartition(3), iterations=3).collect()
    }
    b = {
        r["node"]: r["rank_int"]
        for r in pagerank(e.repartition(17), iterations=3).collect()
    }
    assert a == b


def test_pagerank_dangling_and_guards(spark):
    from weather_monitoring_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank,
    )

    # node 2 is dst-only (dangling). Default policy: its mass is
    # redistributed floor(dm/N) to every node — textbook PageRank,
    # total mass conserved up to floor losses.
    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    out = {r["node"]: r for r in pagerank(e, iterations=2).collect()}
    assert set(out) == {1, 2}
    assert out[2]["rank_int"] > out[1]["rank_int"]
    total_r = sum(r["rank_int"] for r in out.values())
    # floor losses only: init split, per-node DIVs, damping DIVs —
    # a handful of units per node per iteration
    assert 0 <= PAGERANK_SCALE - total_r <= 2 * 2 * 4
    # drop policy: the pre-r10 simplification — mass decays
    out_d = {
        r["node"]: r
        for r in pagerank(e, iterations=2, dangling="drop").collect()
    }
    total_d = sum(r["rank_int"] for r in out_d.values())
    assert total_d < total_r
    assert out_d[2]["rank_int"] > out_d[1]["rank_int"]
    import pytest

    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError, match="dangling"):
        pagerank(e, dangling="nope")
    with pytest.raises(ValueError, match="tol"):
        pagerank(e, tol=-1)
    # empty edge frame: explicit audit-grade error, not ZeroDivisionError
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty, iterations=1)


def test_pagerank_tol_early_stop_matches_full_run(spark):
    """tol stops at the first iteration whose max |Δrank_int| <= tol; a
    converged fixpoint is invariant under further iterations, so the
    early-stopped result equals the long fixed-iteration run exactly."""
    from weather_monitoring_spark.operators.graph import pagerank

    # 2-cycle with a dangling spur: converges in a handful of rounds
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "src bigint, dst bigint"
    )
    full = {
        r["node"]: r["rank_int"] for r in pagerank(e, iterations=60).collect()
    }
    early = {
        r["node"]: r["rank_int"]
        for r in pagerank(e, iterations=60, tol=0).collect()
    }
    assert early == full
