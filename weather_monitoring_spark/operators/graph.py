"""Distributed connected components — the missing last step of a fuzzy
dedup pipeline.

Near-dup detection yields PAIRS; survivor selection needs CLUSTERS
(a~b and b~c put a, c in one group even when (a, c) was never emitted as
a pair). ``connected_components`` computes, for every node, the minimum
node id reachable through the pair graph — the canonical deterministic
cluster label.

Algorithm: min-label propagation with pointer jumping.

- per round, every node takes ``min(own label, neighbors' labels)`` —
  one equi-join edges x labels + one groupBy(node).min, both plain
  shuffles on the node id;
- then one pointer-jumping step (``label := label[label]``, a self-join
  of the label table) collapses chains exponentially, so convergence is
  O(log diameter) rounds, not O(diameter) — the standard trick from the
  large-star/small-star family (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14);
- every round ends in an eager ``localCheckpoint`` (lineage truncation —
  iterative DataFrame loops otherwise stack plans) and a convergence
  count, so the loop stops as soon as labels are a fixpoint.

At 100 TB the per-round cost is two shuffles of (node, label) pairs —
never documents — and near-dup graphs are overwhelmingly tiny clusters,
so round counts stay low single digits."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hard stop for pathological graphs; with pointer jumping a chain of
#: 2^20 nodes converges in ~20 rounds, so 30 is effectively unbounded.
CC_MAX_ITER = 30


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = CC_MAX_ITER,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component =
    min node id reachable. Deterministic — no RNG, no order dependence."""
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("node").distinct().select("node", F.col("node").alias("lbl"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("nbr"), "lbl"), "nbr")
            .groupBy("node")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
        )
        # pointer jumping: label := label[label] (labels are node ids, so
        # the label table doubles as the parent table).
        jumped = (
            stepped.join(
                stepped.select(F.col("node").alias("lbl"), F.col("lbl").alias("plbl")),
                "lbl",
            )
            .select("node", F.col("plbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.join(labels.withColumnRenamed("lbl", "old"), "node")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("component"))


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Transitive-closure survivor selection: every document gets its
    cluster label (min doc id of its near-dup component; itself when it
    has no near-dup) and a survivor flag (true iff it IS the label).

    Exactly one survivor per transitive cluster — the property greedy
    pairwise dropping cannot give (a~b, b~c with a<b<c drops both b and
    c; here c survives or falls with its whole cluster, never both)."""
    comp = connected_components(pairs)
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).cast("long").alias("cluster"),
            (F.col(id_col) == F.coalesce("component", F.col(id_col))).alias("survivor"),
        )
    )
