"""Guarantees for operators/clustering.py — deterministic spherical
k-means with the quantized (cross-engine-exact, partitioning-invariant)
Lloyd update, plus cluster-balanced sampling. Cross-engine exactness
itself runs in test_oracle_parity.py (x_kmeans_clusters /
x_cluster_balanced_sample); here are the algorithmic guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM
from weather_monitoring_spark.operators.clustering import (
    cluster_balanced_sample,
    kmeans_assign,
    kmeans_embeddings,
    kmeans_train,
)


def _fixture_emb(spark):
    return spark.read.parquet(f"{SF_MEDIUM}/embeddings.parquet")


def _synth_emb(spark, n: int):
    """Deterministic synthetic 8-dim embeddings (md5-derived, distributed)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), i -> CAST("
            "CAST(conv(substring(md5(concat(id, ':', i)), 1, 8), 16, 10) AS DOUBLE)"
            " / 4294967296.0 - 0.5 AS FLOAT))"
        ).alias("embedding"),
    )


def test_partitioning_invariance(spark):
    """THE quantized-update property: bit-identical output (cluster ids
    AND cosines, by float hex) no matter how the input is partitioned.
    The classic float-avg Lloyd update fails this — partial sums arrive
    in shuffle order — which is exactly why the update sums int64s."""
    base = _synth_emb(spark, 400)
    runs = []
    for parts in (3, 17):
        rows = kmeans_embeddings(
            base.repartition(parts), n_clusters=5, n_iters=3
        ).collect()
        runs.append(
            sorted((r["vec_id"], r["cluster"], r["cos"].hex()) for r in rows)
        )
    assert runs[0] == runs[1]


def test_planted_clusters_recovered(spark):
    """Three tight direction bundles (axis-aligned cones, small jitter)
    must come back as exactly three pure clusters."""
    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 6), i -> CAST("
            "CASE WHEN i - 1 = id % 3 THEN 10.0 ELSE "
            "CAST(conv(substring(md5(concat(id, ':', i)), 1, 4), 16, 10) AS DOUBLE)"
            " / 65536.0 END AS FLOAT))"
        ).alias("embedding"),
    )
    rows = kmeans_embeddings(emb, n_clusters=3, n_iters=4).collect()
    by_group: dict[int, set[int]] = {}
    for r in rows:
        by_group.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    # each planted bundle maps to ONE cluster, and the three differ
    assert all(len(cs) == 1 for cs in by_group.values())
    assert len({cs.pop() for cs in by_group.values()}) == 3
    assert all(r["cos"] > 0.9 for r in rows)


def test_gemm_fold_assignment_agreement(spark):
    """The Arrow-GEMM scale path and the oracle-exact fold path assign
    every fixture vector to the same cluster (cosines may differ in the
    last ulp — summation association — so only ids are pinned)."""
    emb = _fixture_emb(spark)
    cent = kmeans_train(emb, n_clusters=8, n_iters=2)
    fold = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, cent).collect()}
    gemm = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, cent, method="gemm").collect()
    }
    assert fold == gemm


def test_balanced_sample_caps_and_determinism(spark):
    emb = _fixture_emb(spark)
    rows = cluster_balanced_sample(emb, cap=10).collect()
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
        assert 1 <= r["cluster_rank"] <= 10
    assert sizes and all(n <= 10 for n in sizes.values())
    again = cluster_balanced_sample(emb, cap=10).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_k_exceeds_corpus(spark):
    """Fewer vectors than requested clusters: the model holds one
    centroid per available seed and every vector still gets a label."""
    emb = _synth_emb(spark, 5)
    rows = kmeans_embeddings(emb, n_clusters=8, n_iters=2).collect()
    assert len(rows) == 5
    assert all(0 <= r["cluster"] < 5 for r in rows)


def test_zero_vector_ties_to_smallest_cluster(spark):
    """A zero vector dots to exactly 0.0 with every centroid; the
    documented tiebreak (greatest over (d, -c)) must give cluster 0."""
    emb = _synth_emb(spark, 50).withColumn(
        "embedding",
        F.expr(
            "CASE WHEN vec_id = 7 THEN transform(sequence(1, 8), i -> CAST(0.0 AS FLOAT))"
            " ELSE embedding END"
        ),
    )
    rows = {r["vec_id"]: r for r in kmeans_embeddings(emb, n_clusters=4).collect()}
    assert rows[7]["cluster"] == 0
    assert rows[7]["cos"] == 0.0


def test_empty_corpus_raises(spark):
    emb = _synth_emb(spark, 10).filter("vec_id < 0")
    with pytest.raises(ValueError, match="empty corpus"):
        kmeans_train(emb)


def test_semdedup_drops_planted_duplicates(spark):
    """50 base vectors + 10 exact copies (cosine 1.0, same cluster by
    construction): every copy-pair collapses to one survivor, and the
    survivor is the min id of its component."""
    from weather_monitoring_spark.operators.clustering import semdedup_survivors

    base = _synth_emb(spark, 50)
    copies = _synth_emb(spark, 50).filter("vec_id < 10").withColumn(
        "vec_id", F.col("vec_id") + 100
    )
    emb = base.unionByName(copies)
    rows = {r["vec_id"]: r for r in semdedup_survivors(emb, threshold=0.99).collect()}
    assert len(rows) == 60
    for i in range(10):
        # copy 100+i clusters with original i; only the original survives
        assert rows[100 + i]["cluster"] == rows[i]["cluster"] == i
        assert rows[i]["survivor"] and not rows[100 + i]["survivor"]


def test_semdedup_degenerate_cluster_guard(spark):
    """The adversarial all-identical-vector corpus: every vector lands in
    ONE cluster, whose uncapped self-join is the n² blowup the blocking
    exists to avoid. Under the default guard the pair set must be the
    LINEAR star (n-1 pairs, min-id keeper) and survivors must equal the
    unguarded exact result."""
    from weather_monitoring_spark.operators.clustering import (
        semdedup_pairs,
        semdedup_survivors,
    )

    n = 200
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 6), i -> CAST(1.0 AS FLOAT))"
        ).alias("embedding"),
    )
    guarded = semdedup_pairs(emb).collect()
    # auto cap = max(64, ceil(4*200/8)) = 100 < 200 -> guard fires:
    # exactly the n-1 star pairs around the min id, never C(n,2).
    assert len(guarded) == n - 1
    assert all(r["id_a"] == 0 and r["cosine"] == 1.0 for r in guarded)
    unguarded = semdedup_pairs(emb, max_cluster_size=None).collect()
    assert len(unguarded) == n * (n - 1) // 2

    s_g = sorted(
        (r["vec_id"], r["cluster"], r["survivor"])
        for r in semdedup_survivors(emb).collect()
    )
    s_u = sorted(
        (r["vec_id"], r["cluster"], r["survivor"])
        for r in semdedup_survivors(emb, max_cluster_size=None).collect()
    )
    assert s_g == s_u
    assert sum(1 for _, _, surv in s_g if surv) == 1


def test_cluster_topics_recovers_planted_vocabulary(spark):
    """Three tight embedding bundles, each paired with a distinct
    vocabulary: every cluster's top term must be its planted word, and
    the shared filler word (df = all clusters) must rank below it."""
    from weather_monitoring_spark.operators.clustering import cluster_topics

    words = {0: "alpha", 1: "bravo", 2: "charlie"}
    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 6), i -> CAST("
            "CASE WHEN i - 1 = id % 3 THEN 1.0 ELSE "
            "(CAST(conv(substring(md5(concat(id, ':', i)), 1, 4), 16, 10) AS DOUBLE)"
            " / 65536.0 - 0.5) * 0.1 END AS FLOAT))"
        ).alias("embedding"),
    )
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat(CASE CAST(id % 3 AS INT) WHEN 0 THEN 'alpha alpha' "
            "WHEN 1 THEN 'bravo bravo' ELSE 'charlie charlie' END, "
            "' filler common words')"
        ).alias("text"),
    )
    rows = cluster_topics(docs, emb, n_clusters=3, top_m=2).collect()
    top = {r["cluster"]: r["token"] for r in rows if r["term_rank"] == 1}
    # cluster ids depend on seeding; the SET of top terms must be the
    # planted vocabulary, one per cluster
    assert sorted(top.values()) == sorted(words.values())
    # the shared filler never beats a planted term
    assert all(r["token"] not in ("filler", "common", "words")
               for r in rows if r["term_rank"] == 1)


def test_quantized_sum_overflow_guard(spark, monkeypatch):
    """kmeans_train / ivf_train must refuse to continue when a cluster
    reaches the int64-overflow member bound (2^27) instead of wrapping
    silently. The bound is monkeypatched small to make it reachable."""
    import weather_monitoring_spark.operators.clustering as cl
    from weather_monitoring_spark.operators.similarity import ivf_train

    emb = _synth_emb(spark, 60)
    monkeypatch.setattr(cl, "QUANT_MAX_MEMBERS", 8)
    with pytest.raises(ValueError, match="overflow"):
        kmeans_train(emb, n_clusters=2, n_iters=1)
    with pytest.raises(ValueError, match="overflow"):
        kmeans_train(emb, n_clusters=2, n_iters=1, method="gemm")
    with pytest.raises(ValueError, match="overflow"):
        ivf_train(emb, n_cells=2, n_iters=1)


def test_gemm_training_partitioning_invariance_and_large_k(spark):
    """The large-k training path keeps the quantized-update property:
    bit-identical centroids at 3 vs 17 input partitions (numpy unit
    normalization is per-row, the int64 sums are order-free)."""
    base = _synth_emb(spark, 400)
    runs = []
    for parts in (3, 17):
        cent = kmeans_train(
            base.repartition(parts), n_clusters=40, n_iters=2, method="gemm"
        )
        runs.append([[v.hex() for v in row] for row in cent])
    assert runs[0] == runs[1]


def test_semdedup_gemm_matches_fold_on_planted_copies(spark):
    """Exact duplicate vectors land in the same cluster under either
    assignment path, so the survivor sets agree on the planted corpus."""
    from weather_monitoring_spark.operators.clustering import semdedup_survivors

    base = _synth_emb(spark, 50)
    copies = _synth_emb(spark, 50).filter("vec_id < 10").withColumn(
        "vec_id", F.col("vec_id") + 100
    )
    emb = base.unionByName(copies)
    fold = sorted(map(tuple, semdedup_survivors(emb, threshold=0.99).collect()))
    gemm = sorted(
        map(tuple, semdedup_survivors(emb, threshold=0.99, method="gemm").collect())
    )
    assert fold == gemm


def test_streaming_assignment_matches_batch(spark, tmp_path):
    """kmeans_assign is a pure projection, so it runs unchanged under
    Structured Streaming (stream-static: the centroid model rides the
    plan as literals) — incremental topic-tagging of an embedding
    stream. Pinned: streaming output == batch output on the same rows,
    both assignment methods."""
    src = str(tmp_path / "emb_src")
    _synth_emb(spark, 200).write.parquet(src)
    static = spark.read.parquet(src)
    cent = kmeans_train(static, n_clusters=4, n_iters=2)
    for method in ("fold", "gemm"):
        batch = sorted(
            (r["vec_id"], r["cluster"]) for r in kmeans_assign(static, cent, method=method).collect()
        )
        stream = spark.readStream.schema(static.schema).parquet(src)
        q = (
            kmeans_assign(stream, cent, method=method)
            .writeStream.format("memory")
            .queryName(f"kmeans_stream_{method}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r["vec_id"], r["cluster"])
            for r in spark.sql(f"SELECT * FROM kmeans_stream_{method}").collect()
        )
        assert got == batch


def test_ivf_train_partitioning_invariance(spark):
    """The IVF trainer now shares the quantized Lloyd update: centroids
    are bit-identical no matter how the input is partitioned (the old
    F.avg summed doubles in shuffle-arrival order — on a real cluster a
    re-run could build a different index than the one it audited)."""
    from weather_monitoring_spark.operators.similarity import ivf_train

    base = _synth_emb(spark, 400).withColumn(
        "embedding",
        F.expr("transform(embedding, x -> x)"),
    )
    runs = []
    for parts in (3, 17):
        cent = ivf_train(base.repartition(parts), n_cells=16, n_iters=2)
        runs.append([[float(v).hex() for v in row] for row in cent])
    assert runs[0] == runs[1]
