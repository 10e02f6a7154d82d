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


def quality_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    quality,  # Column: higher = better
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware survivor selection: like ``dedup_clusters``, but the
    kept copy of each near-dup cluster is the HIGHEST-``quality`` member
    (ties -> smallest id), not the smallest id. This is the policy a
    production pipeline actually wants — near-dup clusters usually mix a
    clean original with truncated/boilerplate-wrapped copies, and min-id
    keeps whichever was crawled first.

    Returns (id, cluster, quality, survivor); exactly one survivor per
    cluster. Deterministic: the argmax is ``max_by`` over the
    lexicographic struct (quality, -id), so equal qualities break toward
    the smaller id on any engine and any partitioning.

    Scale shape: clustering (pointer-jumping components over the pair
    set) dominates; selection adds one per-cluster aggregate over
    (cluster, quality, id) triples and one join of the cluster-count-
    sized keeper table back (AQE broadcasts it when small). Documents
    never shuffle — only ids, labels, and scores."""
    labeled = dedup_clusters(docs, pairs, id_col=id_col).select(id_col, "cluster")
    scored = labeled.join(
        docs.select(F.col(id_col), quality.cast("double").alias("quality")), id_col
    )
    keepers = scored.groupBy("cluster").agg(
        F.max_by(
            F.col(id_col),
            F.struct(F.col("quality"), (-F.col(id_col)).alias("_nid")),
        ).alias("_keeper")
    )
    return scored.join(keepers, "cluster").select(
        id_col,
        "cluster",
        "quality",
        (F.col(id_col) == F.col("_keeper")).alias("survivor"),
    )


#: leakage_safe_split defaults: 80/10/10, the q59 salt discipline.
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10
SPLIT_SALT = "split"


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = SPLIT_TRAIN_PCT,
    val_pct: int = SPLIT_VAL_PCT,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Dedup-aware train/val/test split: hash the near-dup CLUSTER label,
    not the document id, so every member of a near-duplicate cluster
    lands in the SAME split. A per-document content-hash split (q59)
    leaks: a near-duplicate pair split across train and test is the eval
    contamination decontamination pipelines exist to prevent — splitting
    by cluster closes that leak by construction, with no RNG and no
    coordination (the split of any document is a pure function of its
    cluster's min id and the salt).

    Returns (id, cluster, bucket, split): cluster = connected-component
    label over the verified near-dup pair graph (itself for singletons),
    bucket = md5-derived 0..99 (the q59 construction applied to the
    cluster label), split in {'train','val','test'} by the pct bounds.

    Scale shape: the clustering (pointer-jumping components over pair
    ids) dominates and moves only (node, label) tuples; the split
    assignment is a zero-shuffle projection on top. Documents never
    cross the wire."""
    labeled = dedup_clusters(docs, pairs, id_col=id_col).select(id_col, "cluster")
    # Column API, not an interpolated SQL literal: a quote/backslash in
    # the salt must reach md5 verbatim, never the SQL parser (the
    # gopher_rules escaping discipline).
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("cluster").cast("string"), F.lit(":" + salt)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return labeled.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


# ---------------- deterministic PageRank (link-graph authority) ------------
#
# Crawl curation uses link authority as a quality prior (the original
# web-scale signal); this is the iterative-join workload Spark was built
# for. Float PageRank is NOT reproducible under shuffle: per-node
# contribution sums arrive in partition order and IEEE addition is not
# associative. The k-means quantized-Lloyd discipline fixes it: ALL
# arithmetic is scaled int64 — ranks quantized at 2^40, the damping
# factor applied as an integer ratio (17/20 for 0.85), contributions
# floor-divided by out-degree — so every sum is order-free, every
# iteration bit-reproducible under ANY partitioning, and the whole
# k-iteration run replays exactly in the DuckDB oracle.

PAGERANK_SCALE = 1 << 40
#: damping 0.85 as an exact integer ratio.
PAGERANK_D_NUM, PAGERANK_D_DEN = 17, 20


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
    dangling: str = "redistribute",
    tol: int | None = None,
) -> DataFrame:
    """Deterministic PageRank over ``edges``. Returns (node, rank_int
    BIGINT, rank DOUBLE = rank_int / 2^40 — the only float, one IEEE
    divide).

    Semantics: nodes = union of sources and destinations; ranks start at
    floor(2^40 / N); each iteration sends floor(rank / out_degree) along
    every edge, then rank' = floor(teleport) + floor(d * inflow) with
    d = 17/20 in exact integers.

    ``dangling`` selects what happens to the mass sitting on nodes with
    NO out-edges:

    - ``"redistribute"`` (default) — textbook PageRank: the summed
      dangling mass is split evenly (floor(dm / N), exact integers)
      into every node's inflow before damping. The per-iteration cost
      is one extra TINY aggregate (a left-semi of ranks against the
      precomputed dangling-node set, one row out) broadcast back — no
      driver collect. Total mass is conserved up to floor losses.
    - ``"drop"`` — the pre-r10 simplification: dangling mass decays
      out of the system. Rankings are typically unaffected for
      comparison use; scores are not textbook. Kept for exact
      reproduction of earlier runs.

    ``tol`` (optional, int in rank_int units) adds convergence-based
    early stop: after each iteration, max |Δ rank_int| over all nodes
    (one extra small aggregate) is compared to ``tol``; the loop stops
    at the first iteration whose delta is <= tol, with ``iterations``
    still the hard cap. Leave None (default) for the fixed-iteration
    contract the unrolled-CTE oracle mirrors. Pair ``tol`` with the
    default ``checkpoint=True``: the delta is an ACTION per iteration,
    so an unpinned lineage would replay iterations 1..k-1 inside
    iteration k (O(k^2) recompute).

    Scale shape: the edge table is the big side and is read ONCE into
    (src, dst, out_degree) — out-degrees ride a broadcast-eligible
    aggregate join when small or one hash join keyed the same as the
    contribution shuffle; each iteration is one join (ranks x edges, on
    src) + one aggregate (on dst) — the canonical two-exchange iteration
    (the dangling aggregate adds one 1-row exchange, broadcast back),
    with ``checkpoint`` (eager localCheckpoint per iteration, default on)
    truncating the lineage so iteration k never re-runs iterations
    1..k-1 (executor loss replays from the checkpointed blocks).
    """
    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    if dangling not in ("redistribute", "drop"):
        raise ValueError(
            f"pagerank: dangling must be 'redistribute' or 'drop', "
            f"got {dangling!r}"
        )
    if tol is not None and tol < 0:
        raise ValueError("pagerank: tol must be >= 0")
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("out_deg"))
    ed = e.join(deg, "src")
    if checkpoint:
        ed = ed.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError(
            "pagerank: edge frame is empty — no nodes to rank (the "
            "audit-grade guard; PAGERANK_SCALE // 0 would be opaque)"
        )
    init = PAGERANK_SCALE // n_nodes
    teleport = (
        PAGERANK_SCALE // n_nodes * (PAGERANK_D_DEN - PAGERANK_D_NUM)
    ) // PAGERANK_D_DEN
    if dangling == "redistribute":
        # the dangling-node SET is iteration-invariant: nodes that never
        # appear as a source. Computed once, pinned.
        dang = nodes.join(
            deg.select(F.col("src").alias("node")), "node", "left_anti"
        )
        if checkpoint:
            dang = dang.localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(init).cast("bigint").alias("rank_int"))
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                # true integer division: '/' on BIGINTs is DOUBLE
                # division whose rounding can cross the floor boundary
                F.expr("rank_int DIV out_deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("contribs"))
        )
        inflow = "coalesce(contribs, CAST(0 AS BIGINT))"
        stepped = nodes.join(contrib, "node", "left")
        if dangling == "redistribute":
            dm = ranks.join(dang, "node", "left_semi").agg(
                F.coalesce(F.sum("rank_int"), F.lit(0))
                .cast("bigint")
                .alias("_dm")
            )
            stepped = stepped.crossJoin(F.broadcast(dm))
            inflow = f"({inflow} + _dm DIV CAST({n_nodes} AS BIGINT))"
        new_ranks = stepped.select(
            "node",
            F.expr(
                "CAST({t} + ({c} * {n}) DIV {d} AS BIGINT)".format(
                    t=teleport, c=inflow, n=PAGERANK_D_NUM, d=PAGERANK_D_DEN
                )
            ).alias("rank_int"),
        )
        if checkpoint:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank_int", "_new")
                .join(ranks, "node")
                .agg(F.max(F.abs(F.col("_new") - F.col("rank_int"))).alias("d"))
                .first()["d"]
            )
            ranks = new_ranks
            if delta is not None and delta <= tol:
                break
        else:
            ranks = new_ranks
    return ranks.select(
        "node",
        "rank_int",
        (F.col("rank_int").cast("double") / F.lit(float(PAGERANK_SCALE))).alias(
            "rank"
        ),
    )


def o_pagerank(
    edges_sql: str, iterations: int = 5, dangling: str = "redistribute"
) -> str:
    """DuckDB mirror of ``pagerank``: the same integer arithmetic with
    the k iterations UNROLLED as a CTE chain (the kmeans oracle
    discipline). ``edges_sql`` must select (src, dst). N, init and
    teleport are floor divisions of the same exact ints the Spark side
    bakes in driver-side, so every iteration is bit-identical. With
    ``dangling="redistribute"`` each iteration gains a 1-row dangling-
    mass CTE (sum of rank over nodes never appearing as a source),
    floor-split into every node's inflow — the same exact-integer term
    the Spark side adds."""
    if dangling not in ("redistribute", "drop"):
        raise ValueError(
            f"o_pagerank: dangling must be 'redistribute' or 'drop', "
            f"got {dangling!r}"
        )
    scale = PAGERANK_SCALE
    n, d = PAGERANK_D_NUM, PAGERANK_D_DEN
    ctes = [
        f"e AS ({edges_sql})",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, deg.out_deg FROM e JOIN deg USING (src))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"nn AS (SELECT CAST(count(*) AS BIGINT) AS nd, "
        f"CAST({scale} // count(*) AS BIGINT) AS init, "
        f"CAST((({scale} // count(*)) * {d - n}) // {d} AS BIGINT) AS tele "
        f"FROM nodes)",
        "dang AS (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM e))",
        "r0 AS (SELECT node, init AS rank_int FROM nodes, nn)",
    ]
    for i in range(iterations):
        ctes.append(
            f"c{i} AS (SELECT ed.dst AS node, "
            f"CAST(sum(r{i}.rank_int // ed.out_deg) AS BIGINT) AS contribs "
            f"FROM ed JOIN r{i} ON ed.src = r{i}.node GROUP BY ed.dst)"
        )
        if dangling == "redistribute":
            ctes.append(
                f"dm{i} AS (SELECT CAST(coalesce(sum(r{i}.rank_int), 0) "
                f"AS BIGINT) AS dm FROM r{i} JOIN dang USING (node))"
            )
            inflow = f"(coalesce(c{i}.contribs, 0) + dm{i}.dm // nn.nd)"
            extra_src = f" CROSS JOIN dm{i}"
        else:
            inflow = f"coalesce(c{i}.contribs, 0)"
            extra_src = ""
        ctes.append(
            f"r{i + 1} AS (SELECT nodes.node, "
            f"CAST(nn.tele + ({inflow} * {n}) // {d} "
            f"AS BIGINT) AS rank_int "
            f"FROM nodes CROSS JOIN nn{extra_src} LEFT JOIN c{i} USING (node))"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT node, rank_int, "
        f"CAST(rank_int AS DOUBLE) / {float(scale)!r} AS rank "
        f"FROM r{iterations}"
    )
