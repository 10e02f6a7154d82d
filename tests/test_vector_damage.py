"""Damaged-embedding tolerance across the vector family (r12, the
null-identity class in vector form).

A NULL, empty, wrong-dimension, or all-zeros embedding is unknown /
unscoreable content. Before the `scoreable_vectors` gate, ONE such row:
- crashed every Arrow matrix build (np.array of a ragged column is an
  object array; linalg.norm/matmul raise AxisError and kill the task —
  at 100 TB, the job);
- raised DIVIDE_BY_ZERO in every SQL cosine under ANSI (zero norms);
- and where it survived, its NULL/NaN cosine occupied top-k rank slots
  (Spark orders NaN above every real score).

Contract: damaged rows are excluded from candidates, queries, seeds,
and results — never fatal, never rank-polluting; valid neighbors are
unaffected."""

from __future__ import annotations

import random

import pytest

BAD_IDS = {100, 101, 102, 103}


@pytest.fixture(scope="module")
def damaged_emb(spark):
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)
    ]
    rows += [
        (100, None),          # null vector
        (101, []),            # empty vector
        (102, [1.0, 2.0]),    # wrong dimensionality
        (103, [0.0] * 64),    # zero norm (NaN cosine / ANSI divide-by-zero)
    ]
    rows.append((200, [v * 1.0001 for v in rows[0][1]]))  # near-dup of 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_excludes_damaged_rows(damaged_emb):
    from weather_monitoring_spark.operators.similarity import cosine_topk

    out = cosine_topk(damaged_emb, [0], k=5).collect()
    assert len(out) == 5
    assert all(r.vec_id not in BAD_IDS for r in out)
    assert all(r.cosine is not None and r.cosine == r.cosine for r in out)
    assert out[0].vec_id == 200  # the planted near-dup still ranks first


def test_neardup_pairs_exclude_damaged_rows_both_methods(damaged_emb):
    from weather_monitoring_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    blocked = {(r.id_a, r.id_b) for r in
               cosine_neardup_pairs(damaged_emb, threshold=0.99).collect()}
    naive = {(r.id_a, r.id_b) for r in
             cosine_neardup_pairs(damaged_emb, threshold=0.99,
                                  method="naive").collect()}
    assert blocked == naive == {(0, 200)}


def test_ann_and_ivf_exclude_damaged_rows(damaged_emb):
    from weather_monitoring_spark.operators.similarity import (
        ann_lsh_topk,
        ivf_topk,
    )

    a = ann_lsh_topk(damaged_emb, [0], k=5).collect()
    assert a and a[0].vec_id == 200
    assert all(r.vec_id not in BAD_IDS for r in a)
    v = ivf_topk(damaged_emb, [0], k=5).collect()
    assert v and all(r.vec_id not in BAD_IDS for r in v)


def test_damaged_query_vector_yields_no_rows_not_a_crash(damaged_emb):
    from weather_monitoring_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    # the null and wrong-dim QUERY ids: driver-side probe-cell selection
    # previously crashed in np.asarray
    assert cosine_topk(damaged_emb, [100], k=3).collect() == []
    assert ivf_topk(damaged_emb, [100, 102], k=3).collect() == []


def test_kmeans_and_reduce_exclude_damaged_rows(damaged_emb):
    from weather_monitoring_spark.operators.clustering import (
        kmeans_assign,
        kmeans_train,
    )
    from weather_monitoring_spark.operators.embeddings import (
        reduce_embeddings,
    )

    cent = kmeans_train(damaged_emb, n_clusters=4)
    for method in ("fold", "gemm"):
        asg = {r.vec_id: r for r in
               kmeans_assign(damaged_emb, cent, method=method).collect()}
        # null/empty/wrong-dim: excluded. The zero vector is DIFFERENT:
        # clustering is a total partition (balanced sampling etc. needs
        # every doc somewhere), so it assigns deterministically with
        # cos 0 — identically on both paths — rather than being dropped.
        assert set(asg).isdisjoint({100, 101, 102})
        assert 0 in asg and 200 in asg
        assert asg[103].cos == 0.0
    kmeans_train(damaged_emb, n_clusters=4, method="gemm")  # no raise

    got = {r.vec_id for r in reduce_embeddings(damaged_emb).collect()}
    exp = {r.vec_id for r in
           reduce_embeddings(damaged_emb, method="expr").collect()}
    # JL projection is linear: the zero vector reduces to the zero
    # vector (present, harmless); null/empty/wrong-dim are gated out
    assert got == exp and got.isdisjoint({100, 101, 102}) and 103 in got


def test_semdedup_tolerates_damaged_rows_both_methods(damaged_emb):
    """The r12 advisor's unfixed family member: semdedup_pairs scored
    with a raw cosine division (one zero-norm vector -> ANSI
    DIVIDE_BY_ZERO kills the job) and had no scoreable_vectors gate
    (one NULL/ragged vector -> Arrow AxisError on the gemm leg)."""
    from weather_monitoring_spark.operators.clustering import (
        semdedup_pairs,
        semdedup_survivors,
    )

    for method in ("fold", "gemm"):
        pairs = semdedup_pairs(
            damaged_emb, n_clusters=4, threshold=0.99, method=method
        ).collect()
        ids = {r.id_a for r in pairs} | {r.id_b for r in pairs}
        # damaged rows never pair; the planted near-dup still does
        assert ids.isdisjoint(BAD_IDS)
        assert (0, 200) in {(r.id_a, r.id_b) for r in pairs}
        assert all(r.cosine == r.cosine and r.cosine is not None
                   for r in pairs)

    surv = {r.vec_id: r for r in
            semdedup_survivors(damaged_emb, n_clusters=4,
                               threshold=0.99).collect()}
    # damaged rows are UNKNOWN content: they survive as their own
    # singleton components — excluded from scoring, never merge victims
    assert len(surv) == 45
    for bad in BAD_IDS:
        assert surv[bad].survivor and surv[bad].cluster == bad
    assert surv[200].cluster == 0 and not surv[200].survivor


def test_mixed_dim_corpus_blocked_agrees_with_naive(spark):
    """r12 advisor: the old per-block-pair modal-length filter dropped
    minority-dim vectors sharing a majority-dim block, so a SAME-dim
    minority near-dup pair was found by naive but lost by blocked. Dim
    now rides as a scoring group key: each dim population scores
    separately, cross-dim pairs are never formed (naive's NULL fold)."""
    from weather_monitoring_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    # minority dim-16 population, including a planted near-dup pair —
    # ids chosen so they land in DIFFERENT id-mod blocks alongside
    # majority-dim vectors
    base16 = [rng.uniform(-1, 1) for _ in range(16)]
    rows += [(300, base16), (301, [v * 1.0001 for v in base16])]
    rows += [(310 + i, [rng.uniform(-1, 1) for _ in range(16)])
             for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    naive = {(r.id_a, r.id_b) for r in
             cosine_neardup_pairs(emb, threshold=0.99,
                                  method="naive").collect()}
    blocked = {(r.id_a, r.id_b) for r in
               cosine_neardup_pairs(emb, threshold=0.99,
                                    method="blocked").collect()}
    assert (300, 301) in naive
    assert blocked == naive
