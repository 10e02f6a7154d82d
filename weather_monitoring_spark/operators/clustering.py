"""Embedding-space clustering for corpus topic analysis and
cluster-balanced sampling (the SemDeDup / topic-rebalancing stage of a
training-data pipeline: Abbas et al. 2023 cluster first, then act
per-cluster; cluster-capped sampling is the standard recipe against
head-topic domination).

Spherical k-means (Dhillon & Modha, 2001) with two properties the stock
float implementation lacks, both load-bearing at cluster scale:

1. **Deterministic seeding, no RNG** — seeds are the ``n_clusters``
   vectors with the smallest ``(md5(id), id)`` (the repo's standard
   engine-portable sample, same as ``ivf_train`` /
   ``sample_exact_k``), so every run of every engine starts identically.

2. **Quantized Lloyd update: bit-reproducible under ANY partitioning.**
   The classic update ``avg(v)`` sums doubles in shuffle-arrival order —
   run the same job twice on a real cluster and the centroids differ in
   ulps, after which assignments (and anything downstream: which
   documents a SemDeDup stage drops!) can flip. Here each member
   contributes ``floor(unit_i * 2^36)`` as an **int64**; integer
   addition is associative and commutative, so the per-cluster sums are
   EXACT and identical no matter how Spark partitions, combines, or
   re-orders — and identical in any other engine. The centroid is then
   the L2-normalized sum (spherical k-means only uses the direction, so
   dividing by the count is unnecessary), computed in IEEE-754 double
   arithmetic that is correctly rounded everywhere. Net effect: the
   whole algorithm is cross-engine-exact and a DuckDB oracle can verify
   cluster ids AND cosines bit-for-bit (``o_kmeans_sql``), the same
   standard the rest of this repo holds (float policy:
   tests/oracle_harness.py — floats compare by hex, never rounded).
   Quantization costs < 2^-36 per coordinate — noise far below the
   centroid movement of any real Lloyd step.

Scale shape: each iteration is one full corpus scan (a zero-shuffle
assignment projection) feeding a ``groupBy(cluster)`` whose combine
moves ``n_clusters × dim`` int64 cells per partition — the shuffle is
KBs regardless of corpus size. The k-row centroid model is collected to
the driver because it IS the model (the ``ivf_train`` precedent,
operators/similarity.py:596). Assignment ships centroids in the task
closure. For large k the ``method="gemm"`` assignment path does one
Arrow-batched matmul per batch instead of k fold expressions; the fold
path is the oracle-exact one. Iterating recomputes the unit projection
per pass (projections are cheaper than caching a second copy of the
corpus at 100 TB; callers looping many iterations over a small corpus
can persist upstream).

Guarantees live in tests/test_clustering.py: partitioning-invariance
(bit-equal output at 3 vs 17 input partitions), planted-cluster
recovery, gemm==fold assignment agreement, k>n and empty-cluster
degeneracies, balanced-sample caps; cross-engine exactness runs in
tests/test_oracle_parity.py as x_kmeans_clusters /
x_cluster_balanced_sample.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.operators.similarity import dot_expr

#: Quantization scale for the Lloyd update: floor(unit_i * 2^36) fits
#: int64 exactly for clusters up to 2^27 members per partition-free sum
#: (|unit_i| <= 1), and the 2^-36 grid is far below any real centroid
#: movement. Shared by the Spark path and the DuckDB oracle.
QUANT_BITS = 36
QUANT_SCALE = float(2**QUANT_BITS)  # 68719476736.0, exact as a double

#: Hard member bound per cluster for the quantized update: past 2^27
#: members a per-cluster int64 coordinate sum could exceed 2^63 and
#: Spark's non-ANSI sum(long) would WRAP SILENTLY, corrupting the
#: centroid. The training loops therefore count members alongside the
#: sums and raise past the bound — the sizing rule is k >= n / 2^27
#: (at 10^9 vectors: k >= 8; any production k is far above). Checked,
#: not just documented (r6 ADVICE item).
QUANT_MAX_MEMBERS = 1 << 27

KMEANS_CLUSTERS = 8
KMEANS_ITERS = 2
CLUSTER_SAMPLE_CAP = 25

#: SemDeDup degenerate-cluster guard (the sqrt-cap policy of
#: dedup.band_df_cutoff, re-derived for clusters): a balanced k-means
#: run puts ~n/k vectors in a cluster, so a cluster holding more than
#: CAP_FACTOR times that is collapsed mass-duplication (the adversarial
#: all-identical-vector corpus puts ALL n in one cluster and the
#: cluster-local self-join re-creates the n² blowup the family exists
#: to avoid). Over-cap clusters divert to exact-vector star pairs —
#: linear in members, survivor-preserving for the identical-vector case
#: that creates degenerate clusters in the first place. The MIN floor
#: keeps tiny corpora on the exact path.
SEMDEDUP_CLUSTER_CAP_FACTOR = 4
SEMDEDUP_CLUSTER_CAP_MIN = 64


def _unit_expr(vec_col: str) -> Column:
    """L2-normalize an array<float> column to array<double>, sequential
    fold norm (bit-identical to the oracle's list_sum — the dot_expr
    contract). Zero vectors stay zero (guarded divide by 1.0)."""
    norm = F.sqrt(dot_expr(vec_col, vec_col))
    safe = F.when(norm == F.lit(0.0), F.lit(1.0)).otherwise(norm)
    return F.transform(F.col(vec_col), lambda x: x.cast("double") / safe)


def _assign_cols(unit_col: str, centroids: list[list[float]]) -> tuple[Column, Column]:
    """(cluster, cos) columns: argmax over per-centroid sequential-fold
    dot products, ties to the smallest cluster id (struct-greatest on
    (dot, -id) — mirrors the oracle's ORDER BY d DESC, c ASC)."""
    structs = []
    for c, cent in enumerate(centroids):
        arr = F.array(*[F.lit(float(v)) for v in cent])
        d = F.aggregate(
            F.zip_with(F.col(unit_col), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        structs.append(F.struct(d.alias("d"), F.lit(-c).alias("nc")))
    best = structs[0] if len(structs) == 1 else F.greatest(*structs)
    return (-best["nc"]).cast("int"), best["d"]


def _centroid_from_qsums(qs: list[int]) -> list[float]:
    """Unit centroid from exact int64 quantized sums — every operation
    here (int64 -> double conversion, multiply, sequential sum, sqrt,
    divide) is IEEE-754 correctly rounded, so the DuckDB oracle's SQL
    mirror produces bit-identical doubles."""
    acc = 0.0
    for q in qs:
        fq = float(q)
        acc += fq * fq
    nrm = math.sqrt(acc)
    if nrm == 0.0:
        nrm = 1.0
    return [float(q) / nrm for q in qs]


def _gemm_quantized_sums(
    emb: DataFrame, centroids: list[list[float]], vec_col: str
) -> DataFrame:
    """Large-k training step: one Arrow-batched pass yielding AT MOST k
    rows per batch — argmax assignment by GEMM, quantized unit
    coordinates by ``np.floor(u * 2^36)`` summed per cluster INSIDE the
    batch (int64 partial sums are associative, so pre-aggregating
    changes nothing about the result while shrinking the Arrow transfer
    and shuffle from n×(dim+1) cells to ~k×(dim+1) per batch; the
    in-batch combine is a sort + ``np.add.reduceat`` — exact int64,
    group order irrelevant). Identical floor semantics to the fold
    path's F.floor, so the downstream int64 sums keep the
    partitioning-invariance property; the unit normalization itself is
    numpy's pairwise summation, ulps apart from the fold path — which is
    why the ORACLE pins method='fold' and gemm is the scale path."""
    import numpy as np

    from weather_monitoring_spark.operators.similarity import (
        scoreable_vectors,
    )

    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    dim = cent.shape[1]
    emb = scoreable_vectors(emb, vec_col, dim=dim)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            mat /= norms
            cells = np.argmax(mat @ cent.T, axis=1)
            q = np.floor(mat * QUANT_SCALE).astype("int64")
            # exact int64 partial sums per cluster present in this batch
            order = np.argsort(cells, kind="stable")
            sc = cells[order]
            starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            present = sc[starts]
            sums = np.add.reduceat(q[order], starts, axis=0)
            counts = np.diff(np.r_[starts, sc.size])
            out = pd.DataFrame(
                {
                    "cluster": present.astype("int32"),
                    "_n": counts.astype("int64"),
                }
            )
            for i in range(dim):
                out[f"q{i}"] = sums[:, i]
            yield out

    schema = "cluster int, _n long, " + ", ".join(
        f"q{i} long" for i in range(dim)
    )
    return emb.select(vec_col).mapInPandas(gen, schema)


def kmeans_train(
    emb: DataFrame,
    n_clusters: int = KMEANS_CLUSTERS,
    n_iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
) -> list[list[float]]:
    """Train deterministic spherical k-means; returns the centroid model
    (``n_clusters`` unit-vector rows — driver-side by design, it IS the
    model). See module docstring for the reproducibility construction.

    ``method="fold"`` is the oracle-exact path (k fold expression trees —
    fine to a few dozen clusters); ``method="gemm"`` is the large-k path
    (one Arrow matmul per batch; still deterministic and
    partitioning-invariant, but its unit normalization is numpy's, so it
    is its OWN reproducible sequence, not the oracle's)."""
    if method not in ("fold", "gemm"):
        raise ValueError(f"unknown assignment method: {method}")
    from weather_monitoring_spark.operators.similarity import (
        scoreable_vectors,
    )

    # NULL/empty vectors are unscoreable (the r12 null-identity class,
    # vector form) — ungated they crashed the seed build / Arrow matmul
    emb = scoreable_vectors(emb, vec_col)
    unit = emb.select(
        F.col(id_col).alias("_kid"), _unit_expr(vec_col).alias("u")
    )
    seeds = (
        unit.orderBy(F.md5(F.col("_kid").cast("string")), F.col("_kid"))
        .limit(n_clusters)
        .select("u")
        .collect()
    )
    # seed belts: a zero vector unit-normalizes to NaNs (dropped — NaN
    # centroids would poison every argmax) and a mixed-dim corpus seeds
    # with the modal dimension (deterministic smallest-on-ties)
    units = [
        list(r["u"])
        for r in seeds
        if r["u"] is not None and all(v == v for v in r["u"])
    ]
    if not units:
        raise ValueError(
            "kmeans_train: empty corpus (no scoreable vectors)"
        )
    lens = sorted(len(u) for u in units)
    modal = max(set(lens), key=lambda d: (lens.count(d), -d))
    centroids = [u for u in units if len(u) == modal]
    dim = len(centroids[0])
    # re-gate to the now-known dim: the fold path's u[i] walk raises
    # INVALID_ARRAY_INDEX under ANSI on any shorter vector
    emb = scoreable_vectors(emb, vec_col, dim=dim)
    unit = emb.select(
        F.col(id_col).alias("_kid"), _unit_expr(vec_col).alias("u")
    )
    scale = F.lit(QUANT_SCALE)
    for _ in range(n_iters):
        if method == "gemm":
            quant = _gemm_quantized_sums(emb, centroids, vec_col)
        else:
            cluster, _cos = _assign_cols("u", centroids)
            quant = unit.select(
                cluster.alias("cluster"),
                F.lit(1).cast("long").alias("_n"),
                *[
                    F.floor(F.col("u")[i] * scale).cast("long").alias(f"q{i}")
                    for i in range(dim)
                ],
            )
        sums = (
            quant.groupBy("cluster")
            .agg(
                F.sum("_n").alias("_n"),
                *[F.sum(f"q{i}").alias(f"q{i}") for i in range(dim)],
            )
            .collect()
        )
        nxt = [list(c) for c in centroids]  # empty clusters keep position
        for r in sums:
            # Overflow guard: past QUANT_MAX_MEMBERS the int64 coordinate
            # sum could exceed 2^63 and wrap silently (non-ANSI sum).
            # The member count rides the same aggregate, so the check is
            # exact and free.
            if r["_n"] >= QUANT_MAX_MEMBERS:
                raise ValueError(
                    f"kmeans_train: cluster {r['cluster']} holds {r['_n']} "
                    f">= 2^{QUANT_MAX_MEMBERS.bit_length() - 1} members — "
                    "the quantized int64 Lloyd sum could overflow. Raise "
                    "n_clusters (sizing rule: n_clusters >= n_vectors / "
                    "2^27)."
                )
            nxt[r["cluster"]] = _centroid_from_qsums(
                [r[f"q{i}"] for i in range(dim)]
            )
        centroids = nxt
    return centroids


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
) -> DataFrame:
    """Assign every vector to its nearest centroid -> (id, cluster, cos).

    ``method="fold"`` (default): pure expression algebra, codegen'd,
    bit-identical to the DuckDB oracle — the correctness reference.
    ``method="gemm"``: one Arrow-batched float64 matmul + argmax per
    batch — the big-k scale path (k fold expressions each walk the
    vector; the GEMM walks it once). Same argmax tiebreak (numpy argmax
    returns the FIRST maximum = smallest cluster id); cosines may differ
    from the fold path in the last ulp (pairwise vs sequential
    summation), which is why the oracle pins the fold path and
    tests/test_clustering.py pins fold==gemm cluster agreement."""
    from weather_monitoring_spark.operators.similarity import (
        scoreable_vectors,
    )

    # the centroid model fixes the operating dim: NULL/mismatched
    # vectors cannot be assigned (GEMM path crashed, fold path emitted
    # NULL-cluster rows) — gated out plan-side
    emb = scoreable_vectors(emb, vec_col, dim=len(centroids[0]))
    if method == "fold":
        unit = emb.select(F.col(id_col), _unit_expr(vec_col).alias("u"))
        cluster, cos = _assign_cols("u", centroids)
        return unit.select(
            F.col(id_col), cluster.alias("cluster"), cos.alias("cos")
        )
    if method != "gemm":
        raise ValueError(f"unknown assignment method: {method}")

    import numpy as np

    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            mat /= norms
            scores = mat @ cent.T
            cells = np.argmax(scores, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype="int64"),
                    "cluster": cells.astype("int32"),
                    "cos": scores[np.arange(len(cells)), cells],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cluster int, cos double"
    )


def kmeans_embeddings(
    emb: DataFrame,
    n_clusters: int = KMEANS_CLUSTERS,
    n_iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
) -> DataFrame:
    """Train + assign in one call -> (id, cluster, cos). ``method``
    selects BOTH the training assignment step and the final assignment
    (fold = oracle-exact, gemm = large-k scale path)."""
    return kmeans_assign(
        emb,
        kmeans_train(emb, n_clusters, n_iters, id_col, vec_col, method),
        id_col,
        vec_col,
        method,
    )


def cluster_balanced_sample(
    emb: DataFrame,
    cap: int = CLUSTER_SAMPLE_CAP,
    n_clusters: int = KMEANS_CLUSTERS,
    n_iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Keep at most ``cap`` vectors per k-means cluster, chosen by the
    deterministic md5 rank WITHIN the cluster -> (id, cluster,
    cluster_rank). This is the anti-head-domination sampler: a topic
    that is 60% of the crawl and a topic that is 0.1% contribute equally
    once both exceed the cap. One extra shuffle over the assignment
    (window by cluster); ranks move (id, cluster) pairs only.

    Pass ``centroids`` (from ``kmeans_train``) to sample against an
    existing model instead of retraining; ``method="gemm"`` for large
    k (same tradeoff as ``kmeans_assign``)."""
    if centroids is not None:
        assigned = kmeans_assign(emb, centroids, id_col, vec_col, method)
    else:
        assigned = kmeans_embeddings(
            emb, n_clusters, n_iters, id_col, vec_col, method
        )
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        assigned.withColumn("cluster_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("cluster_rank") <= cap)
        .select(id_col, "cluster", "cluster_rank")
    )


def semdedup_pairs(
    emb: DataFrame,
    n_clusters: int = KMEANS_CLUSTERS,
    n_iters: int = KMEANS_ITERS,
    threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
    max_cluster_size: int | str | None = "auto",
) -> DataFrame:
    """SemDeDup candidate generation (Abbas et al. 2023): exact cosine
    near-dup pairs computed only WITHIN each k-means cluster ->
    (id_a, id_b, cosine). The quadratic work drops from n² to
    Σ cluster_size² — ``n_clusters`` is the scale knob: pick
    k ≈ n / target_cluster_size and the per-cluster self-join stays
    bounded no matter how big the corpus gets (the paper runs 50k
    clusters over LAION). The tradeoff is recall at cluster borders —
    a near-dup pair split across two clusters is not scored — which is
    the documented SemDeDup semantics, not an approximation defect; the
    deterministic k-means makes the blocking (and so the exact result)
    reproducible cross-engine, unlike the paper's RNG k-means.

    ``max_cluster_size`` is the DEGENERATE-CLUSTER guard (the
    hot-bucket cap policy of ``dedup.minhash_lsh_pairs``, applied to
    the cluster-local pair join): ``"auto"`` (default) derives
    ``max(SEMDEDUP_CLUSTER_CAP_MIN, ceil(CAP_FACTOR * n /
    n_clusters))`` lazily as a broadcast 1-row aggregate, an int pins
    it, ``None`` disables (oracle cross-checks). A cluster over the cap
    is collapsed mass-duplication (an all-identical-vector corpus puts
    all n vectors into ONE cluster, whose self-join would re-create
    exactly the n² blowup the clustering exists to avoid); its members
    divert to exact-vector star pairs — ``groupBy`` the vector VALUE
    (engine-portable: array equality, no float formatting), min-id
    keeper, cosine literal 1.0 — linear in members and
    survivor-preserving for identical vectors. Near-identical (not
    bit-equal) vectors inside an over-cap cluster trade recall for
    boundedness, mirroring the LSH hot-bucket contract. The DuckDB
    oracle replays the guard from the same constants.

    Shuffle shape: one assignment scan, then one self-equi-join keyed on
    the cluster id (skew bounded by the k knob AND the cap). Cosines use
    the same sequential-fold expression the oracle's list_sum replays."""
    from weather_monitoring_spark.operators.similarity import (
        COSINE_NEARDUP_THRESHOLD,
        _safe_cosine,
        norm_expr,
        scoreable_vectors,
    )

    if threshold is None:
        threshold = COSINE_NEARDUP_THRESHOLD
    # Damage gate (the r12 null-identity class, vector form): a NULL /
    # empty embedding must not reach the Arrow k-means matrix (ragged
    # object-array -> AxisError kills the task) nor the pair join. The
    # auto cluster cap below then counts the PARTICIPATING corpus, which
    # is the population the Σ cluster_size² bound is about. Unscoreable
    # rows re-enter in semdedup_survivors as singleton survivors (the
    # oracle's LEFT JOIN from all embeddings), never as merge victims.
    emb = scoreable_vectors(emb, vec_col)
    cent = kmeans_train(emb, n_clusters, n_iters, id_col, vec_col, method)
    # Re-gate to the model's dim so BOTH legs share one membership
    # policy: kmeans_assign("gemm") dim-gates internally, but the fold
    # leg's inline _assign_cols would hand a wrong-dim vector a NULL-dot
    # argmax cluster instead of excluding it.
    emb = scoreable_vectors(emb, vec_col, dim=len(cent[0]))
    if method == "gemm":
        # large-k blocking: cluster labels ride the Arrow pass; the pair
        # scoring below stays the JVM-side exact fold either way
        t = emb.select(F.col(id_col), F.col(vec_col)).join(
            kmeans_assign(emb, cent, id_col, vec_col, "gemm").select(
                F.col(id_col), F.col("cluster").alias("_kc")
            ),
            id_col,
        )
    else:
        base = emb.select(
            F.col(id_col), F.col(vec_col), _unit_expr(vec_col).alias("_u")
        )
        cluster, _cos = _assign_cols("_u", cent)
        t = base.select(F.col(id_col), F.col(vec_col), cluster.alias("_kc"))
    # Pin: the cluster-size aggregate and the pair join both consume the
    # assignment; without the pin the k-fold/GEMM assignment runs twice.
    t = t.localCheckpoint(eager=False)

    hot_pairs = None
    cold = t
    if max_cluster_size is not None:
        csz = t.groupBy("_kc").agg(F.count(F.lit(1)).alias("_csz"))
        if max_cluster_size == "auto":
            cut = emb.agg(
                F.greatest(
                    F.lit(SEMDEDUP_CLUSTER_CAP_MIN).cast("long"),
                    F.ceil(
                        F.lit(SEMDEDUP_CLUSTER_CAP_FACTOR)
                        * F.count(F.lit(1))
                        / F.lit(n_clusters)
                    ),
                ).alias("_cut")
            )
            hot = (
                csz.crossJoin(F.broadcast(cut))
                .filter(F.col("_csz") > F.col("_cut"))
                .select("_kc")
            )
        else:
            hot = csz.filter(F.col("_csz") > max_cluster_size).select("_kc")
        # At most n_clusters rows by construction — broadcast both legs.
        cold = t.join(F.broadcast(hot), "_kc", "left_anti")
        members = t.join(F.broadcast(hot), "_kc", "left_semi")
        keepers = members.groupBy(vec_col).agg(F.min(id_col).alias("_keeper"))
        hot_pairs = (
            members.join(keepers, vec_col)
            .filter(F.col(id_col) > F.col("_keeper"))
            .select(
                F.col("_keeper").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(1.0).alias("cosine"),
            )
        )

    a = cold.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm_expr(vec_col).alias("na"),
        F.col("_kc"),
    )
    b = cold.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm_expr(vec_col).alias("nb"),
        F.col("_kc"),
    )
    pairs = (
        a.join(b, "_kc")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            # _safe_cosine, not raw division: one zero-norm (all-zeros)
            # vector passes the shape gate above but raises ANSI
            # DIVIDE_BY_ZERO under `/` — NULL cosine fails the
            # threshold and the row drops out, matching the oracle's
            # NaN >= threshold = false.
            "cosine",
            _safe_cosine(dot_expr("va", "vb"), F.col("na") * F.col("nb")),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )
    if hot_pairs is not None:
        pairs = pairs.unionByName(hot_pairs)
    return pairs


def semdedup_survivors(
    emb: DataFrame,
    n_clusters: int = KMEANS_CLUSTERS,
    n_iters: int = KMEANS_ITERS,
    threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
    max_cluster_size: int | str | None = "auto",
) -> DataFrame:
    """Full SemDeDup stage: cluster-scoped near-dup pairs -> connected
    components -> one survivor per component (min-id keeper) ->
    (id, cluster, survivor) — same contract as the global
    x_semantic_dedup, at Σ cluster_size² cost instead of n².
    ``max_cluster_size`` is the degenerate-cluster guard (see
    :func:`semdedup_pairs`)."""
    from weather_monitoring_spark.operators.graph import dedup_clusters

    pairs = semdedup_pairs(
        emb,
        n_clusters,
        n_iters,
        threshold,
        id_col,
        vec_col,
        method,
        max_cluster_size,
    )
    return dedup_clusters(emb, pairs.select("id_a", "id_b"), id_col=id_col)


#: Top terms reported per cluster in cluster_topics.
CLUSTER_TOPIC_TERMS = 5


def cluster_topics(
    docs: DataFrame,
    emb: DataFrame,
    n_clusters: int = KMEANS_CLUSTERS,
    n_iters: int = KMEANS_ITERS,
    top_m: int = CLUSTER_TOPIC_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
) -> DataFrame:
    """What is each embedding cluster ABOUT? Label k-means clusters with
    their distinguishing terms: cluster-level TF-IDF over the documents
    assigned to each cluster -> (cluster, token, tf, df, score,
    term_rank), term_rank 1..top_m per cluster.

    This is the corpus-exploration companion to the clustering family
    (the SemDeDup-paper workflow: cluster the embedding space, then ask
    what the clusters contain before deciding per-cluster policy). The
    "document" unit of the TF-IDF is the CLUSTER: ``tf`` = term
    occurrences across the cluster's documents, ``df`` = number of
    clusters containing the term, ``score = tf * (K / df)`` with K =
    observed cluster count — the raw inverse frequency, NOT log(),
    for the cross-engine bit-stability reason ``textops.tfidf_topk``
    documents. Ties rank by (score desc, token asc). Deterministic
    end-to-end (quantized k-means + integer counts + one IEEE divide),
    so the ENTIRE composition — clustering included — replays in DuckDB
    (``extra: x_cluster_topics``).

    Scale shape: assignment is the zero-Exchange projection; the
    (cluster, token) aggregate shuffles term counts with map-side
    partials (bounded by clusters x vocabulary); the cluster-df
    aggregate and the per-cluster top-m window ride the same keys.
    Documents join to assignments on the id — at 100 TB that join is
    the reason embeddings carry the document id in the first place."""
    from weather_monitoring_spark.functions.text import tokens_expr

    assigned = kmeans_embeddings(
        emb, n_clusters, n_iters, vec_id_col, vec_col, method
    ).select(F.col(vec_id_col).alias("_aid"), "cluster")
    labeled = docs.join(
        assigned, docs[id_col] == F.col("_aid"), "inner"
    ).select("cluster", F.col(id_col), F.col(text_col))
    tok = labeled.select(
        "cluster", F.explode(tokens_expr(text_col)).alias("token")
    )
    tf = (
        tok.groupBy("cluster", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_clust = tf.agg(
        F.count_distinct("cluster").cast("double").alias("_k")
    )
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_clust))
        .withColumn(
            "score",
            F.col("tf").cast("double") * (F.col("_k") / F.col("df").cast("double")),
        )
        .drop("_k")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= top_m)
        .select("cluster", "token", "tf", "df", "score", "term_rank")
    )


# ---- DuckDB oracle mirrors ------------------------------------------------


def _o_kmeans_ctes(
    n_clusters: int,
    n_iters: int,
    dim: int,
    table: str,
    id_col: str,
    vec_col: str,
) -> str:
    """CTE chain ending in a{n_iters} = (vec_id, u, c, d): the final
    assignment against the iterated centroids. Every step mirrors the
    Spark path bit-for-bit (see module docstring)."""
    scale = repr(QUANT_SCALE)
    rng = f"range(1, {dim + 1})"
    parts = [
        f"""u AS (
          SELECT {id_col} AS vec_id,
                 list_transform({vec_col}, x -> CAST(x AS DOUBLE) /
                   (CASE WHEN nrm = 0.0 THEN 1.0 ELSE nrm END)) AS u
          FROM (SELECT {id_col}, {vec_col},
                       sqrt(list_sum(list_transform({vec_col},
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                FROM {table})
        )""",
        f"""c0 AS (
          SELECT CAST(row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS c,
                 u AS v
          FROM u
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {n_clusters}
        )""",
    ]
    for j in range(n_iters + 1):
        parts.append(
            f"""a{j} AS (
              SELECT vec_id, u, c, d FROM (
                SELECT vec_id, u, c, d,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d DESC, c ASC) AS rn
                FROM (SELECT t.vec_id, t.u, cc.c,
                             list_sum(list_transform({rng},
                                  i -> t.u[i] * cc.v[i])) AS d
                      FROM u t CROSS JOIN c{j} cc))
              WHERE rn = 1
            )"""
        )
        if j == n_iters:
            break
        parts.append(
            f"""q{j} AS (
              SELECT c, i, SUM(CAST(floor(u[i] * {scale}) AS BIGINT)) AS q
              FROM a{j}, {rng} t(i)
              GROUP BY c, i
            )""",
        )
        parts.append(
            f"""c{j + 1} AS (
              SELECT prev.c, COALESCE(nw.v, prev.v) AS v
              FROM c{j} prev
              LEFT JOIN (
                SELECT c, list_transform(ql, x -> CAST(x AS DOUBLE) /
                         (CASE WHEN nrm = 0.0 THEN 1.0 ELSE nrm END)) AS v
                FROM (SELECT c, ql,
                             sqrt(list_sum(list_transform(ql,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                      FROM (SELECT c, list(q ORDER BY i) AS ql
                            FROM q{j} GROUP BY c))
              ) nw ON nw.c = prev.c
            )"""
        )
    return ",\n".join(parts)


def o_kmeans_sql(
    n_clusters: int = KMEANS_CLUSTERS,
    n_iters: int = KMEANS_ITERS,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    ctes = _o_kmeans_ctes(n_clusters, n_iters, dim, table, id_col, vec_col)
    return f"""
        WITH {ctes}
        SELECT vec_id, c AS cluster, d AS cos FROM a{n_iters}
    """


def o_cluster_balanced_sample_sql(
    cap: int = CLUSTER_SAMPLE_CAP,
    n_clusters: int = KMEANS_CLUSTERS,
    n_iters: int = KMEANS_ITERS,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    ctes = _o_kmeans_ctes(n_clusters, n_iters, dim, table, id_col, vec_col)
    return f"""
        WITH {ctes}
        SELECT vec_id, cluster, cluster_rank FROM (
          SELECT vec_id, c AS cluster,
                 row_number() OVER (PARTITION BY c
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cluster_rank
          FROM a{n_iters})
        WHERE cluster_rank <= {cap}
    """
