"""Operator-level tests for the LLM-pipeline extensions: LSH recall vs
exact ground truth, approx-sketch accuracy, multimodal plumbing shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from weather_monitoring_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from weather_monitoring_spark.operators.multimodal import (
    decode_images,
    sample_frames,
    synthetic_assets,
)
from weather_monitoring_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    ivf_topk,
)
from weather_monitoring_spark.sources.tables import load_table


def test_minhash_lsh_recall_vs_exact(spark):
    """Every planted near-duplicate (exact Jaccard >= 0.9) must appear in
    the LSH candidate set — the 1-(1-j^r)^b guarantee made concrete."""
    docs = load_table(spark, SF_SMALL, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert exact, "expected planted near-duplicates in the fixture corpus"
    candidates = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()}
    missed = exact - candidates
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_ivf_persisted_index_partition_pruning(spark, tmp_path):
    """The persisted-index path, end to end: ivf_write_index writes the
    cell-partitioned table + centroid model; ivf_probe_index over the
    SAME corpus returns exactly ivf_topk's rows (same deterministic
    training -> same probes -> same exact scores), and its scan plans
    PARTITION pruning on cell — the 100 TB probe cost claim, executable."""
    from weather_monitoring_spark.operators.similarity import (
        ivf_probe_index,
        ivf_write_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    out = str(tmp_path / "ivf_index")
    ivf_write_index(emb, out)
    qids = [0, 1, 2, 3, 4]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    probed = ivf_probe_index(spark, out, queries)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    got = sorted(
        (r["qid"], r["vec_id"], r["cosine"].hex(), r["rank"])
        for r in probed.collect()
    )
    want = sorted(
        (r["qid"], r["vec_id"], r["cosine"].hex(), r["rank"])
        for r in ivf_topk(emb, qids).collect()
    )
    assert got == want
    # determinism of the persisted artifact: writing again is identical
    # (model sidecar read back through Spark — any-Hadoop-FS contract)
    from weather_monitoring_spark.operators.similarity import (
        _read_centroid_model,
    )

    out2 = str(tmp_path / "ivf_index2")
    c1 = ivf_write_index(emb, out2)
    stored = _read_centroid_model(spark, out)
    assert [[v.hex() for v in row] for row in c1.tolist()] == [
        [v.hex() for v in row] for row in stored.tolist()
    ]


def test_ivf_append_index_batch_visibility(spark, tmp_path):
    """The daily-batch ANN story: appending new vectors against the
    STORED model (no retrain, history never read) makes them probeable —
    a planted exact copy of a query vector comes back at rank 1 with
    cosine 1.0, and its stored cell matches the model's assignment."""
    from weather_monitoring_spark.operators.similarity import (
        ivf_append_index,
        ivf_probe_index,
        ivf_write_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    out = str(tmp_path / "ivf_index")
    ivf_write_index(emb, out)
    qvec = list(emb.filter("vec_id = 0").collect()[0]["embedding"])
    new_id = 1_000_000
    batch = spark.createDataFrame(
        [(new_id, qvec)], "vec_id long, embedding array<float>"
    )
    ivf_append_index(batch, out)
    got = {
        r["rank"]: (r["vec_id"], r["cosine"])
        for r in ivf_probe_index(spark, out, [(0, qvec)], k=3).collect()
    }
    assert got[1][0] == new_id and got[1][1] == 1.0
    stored_cell = (
        spark.read.parquet(out).filter(F.col("vec_id") == new_id).collect()
    )
    assert len(stored_cell) == 1


def test_ivf_reindex_matches_fresh_build(spark, tmp_path):
    """The index-maintenance recipe: an append-heavy index (base build +
    batch appends against the stale model) reindexed in place must equal
    ivf_write_index run fresh on the union corpus — bit-identical
    centroids AND identical (id -> cell) assignment — so drift repair
    can be automated without changing probe semantics. The out_dir mode
    must leave the source index untouched."""
    from weather_monitoring_spark.operators.similarity import (
        _read_centroid_model,
        ivf_append_index,
        ivf_reindex,
        ivf_write_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    batch = emb.filter(F.col("vec_id") >= 300)
    out = str(tmp_path / "ivf_appended")
    ivf_write_index(base, out)
    ivf_append_index(batch, out)
    stale = _read_centroid_model(spark, out)

    fresh_dir = str(tmp_path / "ivf_fresh")
    fresh_cent = ivf_write_index(emb, fresh_dir)

    # out_dir mode first: source must stay on the stale model
    side_dir = str(tmp_path / "ivf_side")
    side_cent = ivf_reindex(spark, out, out_dir=side_dir)
    assert side_cent.tobytes() == fresh_cent.tobytes()
    assert _read_centroid_model(spark, out).tobytes() == stale.tobytes()

    re_cent = ivf_reindex(spark, out)
    assert re_cent.tobytes() == fresh_cent.tobytes()

    def cells(path):
        return {
            r["vec_id"]: r["cell"] for r in spark.read.parquet(path).collect()
        }

    assert cells(out) == cells(fresh_dir) == cells(side_dir)
    assert _read_centroid_model(spark, out).tobytes() == fresh_cent.tobytes()


def test_ivf_query_budget_guard(spark):
    """ivf_topk / ivf_pq_topk collect query vectors driver-side; the
    max_queries guard must refuse an over-budget query set with a clear
    error instead of silently shipping it through the driver."""
    from weather_monitoring_spark.operators.similarity import ivf_pq_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        ivf_topk(emb, list(range(11)), max_queries=10)
    with pytest.raises(ValueError, match="max_queries"):
        ivf_pq_topk(emb, list(range(11)), max_queries=10)
    # None overrides knowingly (tiny set here, just the escape hatch)
    assert ivf_topk(emb, [0], k=3, max_queries=None).count() > 0


def test_minhash_methods_agree(spark):
    """The zero-shuffle Arrow signature path must be bit-identical to the
    legacy explode+agg path — same integer math ((h*a+b) mod P over
    int64), different execution shape. Full row compare including every
    band key."""
    from weather_monitoring_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, SF_SMALL, "documents")
    arrow = {
        r["doc_id"]: tuple(r)
        for r in minhash_signatures(docs, method="arrow").collect()
    }
    agg = {
        r["doc_id"]: tuple(r)
        for r in minhash_signatures(docs, method="agg").collect()
    }
    assert arrow == agg
    with pytest.raises(ValueError):
        minhash_signatures(docs, method="nope")


def test_simhash_segmented_reduce_batch_boundary_carry(spark):
    """The mapInPandas vote reduce must merge a document whose exploded
    tokens straddle Arrow batch boundaries: with maxRecordsPerBatch
    forced to 100, docs of ~250 distinct-ish tokens span 3+ batches
    each (including whole batches that are a single mid-document
    segment), and a carried doc that ends EXACTLY at a batch boundary
    exercises the emit-ahead path. Signatures must equal the aggregate
    path bit-for-bit, across multiple partitions."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.dedup import simhash_signatures

    # 40 docs x 250 tokens; token streams differ per doc. doc 7 gets
    # exactly 100 tokens so its segment can end on a batch edge.
    rows = [
        (i, " ".join(f"w{i}x{j % 97}" for j in range(100 if i == 7 else 250)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        arrow = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, method="arrow").collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    agg = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, method="agg").collect()
    }
    assert arrow == agg and len(arrow) == 40


def test_simhash_methods_agree(spark):
    """The zero-shuffle Arrow SimHash path must be bit-identical to the
    legacy explode + 64-column vote aggregate — same md5 words, same
    vote math, different execution shape. Empty-token docs must be
    absent from BOTH (the agg path's explode drops them; the arrow path
    filters size(_tk) > 0 to match the unnest-based oracle)."""
    from weather_monitoring_spark.operators.dedup import simhash_signatures

    docs = load_table(spark, SF_SMALL, "documents")
    # Adversarial tokenization rows (r9: the arrow path tokenizes via
    # codegen split + a Python empties-drop while the agg path uses
    # tokens_expr's filter() — these must agree): leading/trailing
    # separators, consecutive separators, unicode uppercase that
    # case-folds INTO ascii (Kelvin sign K -> k, fullwidth stays
    # non-ascii), accents as separators, digits, and degenerate docs.
    extra = docs.sparkSession.createDataFrame(
        [
            (10_000_001, ""),
            (10_000_002, None),
            (10_000_003, "     "),
            (10_000_004, "...leading!! and--trailing..."),
            (10_000_005, "MiXeD CaSe 123abc ABC123"),
            (10_000_006, "Kelvin İstanbul café naïve"),
            (10_000_007, "tabs\tand\nnewlines\r\nsplit too"),
            (10_000_008, "éèê"),
        ],
        "doc_id long, text string",
    )
    docs = docs.select("doc_id", "text").unionByName(extra)
    arrow = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, method="arrow").collect()
    }
    agg = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, method="agg").collect()
    }
    assert arrow == agg
    assert 10_000_001 not in arrow and 10_000_002 not in arrow
    with pytest.raises(ValueError):
        simhash_signatures(docs, method="nope")


def test_simhash_arrow_plan_single_python_eval(spark):
    """The zero-shuffle SimHash build must cross into Python exactly
    ONCE (the mapInPandas segmented reduce) with NO doc_id exchange and
    NO interpreted higher-order functions on the JVM side: the r8
    packed-hash variant kept the md5 inside a transform() lambda
    (CodegenFallback — interpreted Conv/ArrayTransform eval dominated
    probe-scale task time), and an intermediate rewrite that filtered
    on the UDF's null output got the UDF duplicated into TWO python
    eval nodes by predicate pushdown (a 64-worker pipe storm at probe
    scale)."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.dedup import simhash_signatures

    docs = load_table(spark, SF_SMALL, "documents")
    plan = (
        simhash_signatures(docs, method="arrow")
        .agg(F.sum(F.bit_count("simhash")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning(doc_id" not in plan
    assert "transform(" not in plan


def test_minhash_arrow_plan_has_no_doc_exchange(spark):
    """The r7 scale property, pinned at the plan level on a REAL parquet
    corpus (a range-derived synthetic corpus value-clusters doc_id and
    hides the agg path's exchange): the Arrow signature build plans NO
    hashpartitioning(doc_id) exchange; the legacy agg path does."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, SF_SMALL, "documents")
    plans = {
        m: minhash_signatures(docs, method=m)
        .agg(F.sum(F.length("sig")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        for m in ("arrow", "agg")
    }
    assert "Exchange hashpartitioning(doc_id" not in plans["arrow"]
    assert "ArrowEvalPython" in plans["arrow"]
    assert "Exchange hashpartitioning(doc_id" in plans["agg"]


def test_minhash_arrow_handles_empty_and_null_docs(spark):
    """NULL text emits NO signature row (unknown content — the r12
    null-identity contract); a shingle-less doc (< 3 tokens) keeps its
    row with sig '' but NULL band keys, so it can never LSH-pair.
    Identical on both signature paths."""
    from weather_monitoring_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, "hi"), (2, None), (3, "one two three four")],
        "doc_id long, text string",
    )
    for method in ("arrow", "agg"):
        rows = {
            r["doc_id"]: r for r in minhash_signatures(docs, method=method).collect()
        }
        assert set(rows) == {1, 3}  # null text: no row
        assert rows[1]["sig"] == "" and rows[1]["band_0"] is None
        assert rows[3]["sig"] != "" and rows[3]["band_0"] is not None


def test_contentless_docs_never_lsh_pair(spark):
    """Two null-text docs and two DIFFERENT sub-shingle short docs must
    not become LSH candidates of each other (they shared the degenerate
    sig-'' bucket before r12 — and at scale the hot-bucket guard then
    collapsed them as exact-signature dups); real near-dups still pair."""
    from weather_monitoring_spark.operators.dedup import minhash_lsh_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, None),
            (2, None),
            (3, "hi"),
            (4, "yo"),
            (5, base),
            (6, base.replace("tok7", "swap", 1)),
        ],
        "doc_id long, text string",
    )
    pairs = {(p.id_a, p.id_b) for p in minhash_lsh_pairs(docs).collect()}
    assert pairs == {(5, 6)}


def test_jaccard_threshold_separates_planted_pairs(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD).collect()
    assert pairs
    assert all(p.jaccard >= JACCARD_THRESHOLD for p in pairs)


def test_ann_lsh_recall_vs_bruteforce(spark):
    """ANN via 16 hyperplanes: same-bucket constraint loses recall by
    design; require the top-1 hit rate to beat a random-bucket baseline
    and all returned cosines to be genuine (match exact scoring)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=10)
    approx = ann_lsh_topk(emb, qids, k=10)
    e = {(r.qid, r.vec_id): r.cosine for r in exact.collect()}
    a = {(r.qid, r.vec_id): r.cosine for r in approx.collect()}
    # every approx result's cosine equals the exact computation
    for k_, v in a.items():
        if k_ in e:
            assert abs(v - e[k_]) < 1e-12
    # and the approx search returns something for most queries
    assert len({q for q, _ in a}) >= 3


def test_lsh_buckets_gemm_equals_expr(spark):
    """The Arrow-GEMM bucket derivation must agree with the all-JVM
    expression derivation on every vector — same md5-derived planes, so
    the only possible divergence is a dot product within summation-order
    noise of exactly zero, which the fixture corpus does not contain."""
    from weather_monitoring_spark.operators.similarity import with_lsh_buckets

    emb = load_table(spark, SF_SMALL, "embeddings")
    cols = ["vec_id", "bucket_0", "bucket_1", "bucket_2", "bucket_3"]
    gemm = sorted(map(tuple, with_lsh_buckets(emb).select(cols).collect()))
    expr = sorted(
        map(tuple, with_lsh_buckets(emb, method="expr").select(cols).collect())
    )
    assert gemm == expr


def test_ivf_topk_recall_exactness_determinism(spark):
    """IVF (spherical k-means cells, 4/16 probes => ~25% of the corpus
    scanned): returned cosines must equal the exact fold, every query must
    fill its k (cells hold ~30 vectors, probes cover ~125 candidates),
    recall@10 must clear 0.5 (measured 0.56 on this corpus — and the whole
    pipeline is deterministic, so that number is stable, which the repeat
    run also asserts)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=10)
    rows = ivf_topk(emb, qids, k=10).collect()
    e = {(r.qid, r.vec_id): r.cosine for r in exact.collect()}
    a = {(r.qid, r.vec_id): r.cosine for r in rows}
    for key, v in a.items():
        if key in e:
            assert abs(v - e[key]) < 1e-12
    from collections import Counter

    per_q = Counter(q for q, _ in a)
    assert all(per_q[q] == 10 for q in qids), per_q
    recall = len(e.keys() & a.keys()) / len(e)
    assert recall >= 0.5, f"recall@10 {recall}"
    rows2 = ivf_topk(emb, qids, k=10).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_distributed_cumsum_equals_naive_window(spark):
    """The range-partitioned cumsum (local windows + broadcast offsets)
    must equal the single-partition global window exactly, for any
    partition count — boundary placement must not matter."""
    from pyspark.sql import Window

    from weather_monitoring_spark.operators.training_prep import distributed_cumsum

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.length("text").alias("v")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = {r.doc_id: r.cum for r in docs.select(
        "doc_id", F.sum("v").over(w).cast("long").alias("cum")
    ).collect()}
    for n_parts in (1, 7, 32):
        dist = {r.doc_id: r.cum for r in distributed_cumsum(
            docs, "doc_id", "v", n_partitions=n_parts
        ).collect()}
        assert dist == naive, f"n_partitions={n_parts}"


def test_distributed_cumsum_reliable_pin_equals_default(spark, tmp_path):
    """The cluster-scale reliable-storage pin (write the narrow
    projection to parquet, re-read) produces exactly the default
    executor-block pin's totals, and the pin directory holds the
    (order, value, _pid) rows the docstring promises."""
    from weather_monitoring_spark.operators.training_prep import distributed_cumsum

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.length("text").alias("v")
    )
    default = {r.doc_id: r.cum for r in distributed_cumsum(
        docs, "doc_id", "v", n_partitions=7
    ).collect()}
    pin_dir = str(tmp_path / "pin")
    pinned = {r.doc_id: r.cum for r in distributed_cumsum(
        docs, "doc_id", "v", n_partitions=7, reliable_pin=pin_dir
    ).collect()}
    assert pinned == default
    stored = spark.read.parquet(pin_dir)
    assert set(stored.columns) == {"doc_id", "v", "_pid"}
    assert stored.count() == docs.count()


def test_pack_token_budget_shard_bounds(spark):
    """Contiguous packing invariants: shard ids are dense from 0, docs in
    id order have non-decreasing shard ids, and every shard's token total
    stays under budget + its largest document (the formulation's bound)."""
    from weather_monitoring_spark.operators.training_prep import pack_token_budget

    docs = load_table(spark, SF_SMALL, "documents")
    packed = pack_token_budget(docs, budget=5_000).collect()
    by_id = sorted(packed, key=lambda r: r.doc_id)
    shards = [r.shard_id for r in by_id]
    assert shards == sorted(shards) and shards[0] == 0
    assert set(shards) == set(range(max(shards) + 1))
    from collections import defaultdict

    totals, biggest = defaultdict(int), defaultdict(int)
    for r in by_id:
        totals[r.shard_id] += r.n_tokens
        biggest[r.shard_id] = max(biggest[r.shard_id], r.n_tokens)
    for s, tot in totals.items():
        if s != max(shards):  # the tail shard may be short
            assert tot >= 5_000 - biggest[s] or len(totals) == 1
        assert tot <= 5_000 + biggest[s]

    # shuffled packing: same docs, same grand total, different adjacency
    shuffled = pack_token_budget(docs, budget=5_000, shuffle=True).collect()
    assert {r.doc_id for r in shuffled} == {r.doc_id for r in packed}
    assert sum(r.n_tokens for r in shuffled) == sum(r.n_tokens for r in packed)
    assert {r.doc_id: r.shard_id for r in shuffled} != {
        r.doc_id: r.shard_id for r in packed
    }


def test_contamination_flags_catch_planted_neardups(spark):
    """A training doc that is a planted near-duplicate of an eval doc
    shares essentially all its shingles — it MUST be flagged; docs with
    zero overlap must appear with an explicit n_shared = 0."""
    from weather_monitoring_spark.operators.training_prep import contamination_flags

    docs = load_table(spark, SF_SMALL, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    flags = contamination_flags(train, bench).collect()
    assert len(flags) == train.count()  # zero-filled: every train doc has a verdict
    flagged = {r.doc_id for r in flags if r.contaminated}
    # ground truth from the exact pairwise machinery: near-dup partners of
    # eval docs that live in the training split
    partners = {
        (r.id_a if r.id_b % 20 == 0 else r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
        if (r.id_a % 20 == 0) != (r.id_b % 20 == 0)
    }
    assert partners, "fixture should plant eval/train near-dup pairs"
    assert partners <= flagged
    assert any(r.n_shared == 0 for r in flags)


def test_approx_sketches_accuracy(spark):
    # The unregistered sketch surface itself (HLL++ / GK per event_type).
    from weather_monitoring_spark.plans.analytics_queries import approx_sketches

    sk = {r.event_type: r for r in approx_sketches(spark, SF_SMALL).collect()}
    ev_small = load_table(spark, SF_SMALL, "events")
    exact = {
        r.event_type: r
        for r in ev_small.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert sk.keys() == exact.keys()
    for et, r in sk.items():
        assert abs(r.approx_users - exact[et].users) / max(exact[et].users, 1) < 0.05
        assert abs(r.approx_p50 - exact[et].p50) / max(abs(exact[et].p50), 1) < 0.05

    orders = load_table(spark, SF_SMALL, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05
    ev = load_table(spark, SF_SMALL, "events")
    row = ev.agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
        F.expr("percentile(value, 0.5)").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / max(row.exact, 1) < 0.05


def test_multimodal_decode_shapes(spark):
    assets = synthetic_assets(spark, 90).cache()
    assert assets.schema["payload"].dataType.typeName() == "binary"
    n_images = assets.filter(F.col("kind") == "image").count()

    decoded = decode_images(assets).cache()
    assert decoded.count() == n_images
    r = decoded.first()
    assert 64 <= r.width < 256 and 64 <= r.height < 256 and 1 <= r.channels <= 3
    assert len(r.sha256) == 64 and len(r.feature) == 8
    # determinism: same payload -> same digest
    again = decode_images(assets)
    assert decoded.select("asset_id", "sha256").exceptAll(
        again.select("asset_id", "sha256")
    ).count() == 0

    frames = sample_frames(assets)
    per_asset = frames.groupBy("asset_id").count()
    assert per_asset.filter(F.col("count") > 1).count() > 0  # 1-to-N shape

    from weather_monitoring_spark.operators.multimodal import resize_images

    resized = resize_images(assets, width=16, height=16).cache()
    assert resized.count() == n_images
    rr = resized.first()
    assert rr.width == 16 and rr.height == 16
    assert len(bytes(rr.resized)) == 16 * 16  # the thumbnailer size contract
    again_r = resize_images(assets, width=16, height=16)
    assert resized.select("asset_id", "resized_sha256").exceptAll(
        again_r.select("asset_id", "resized_sha256")
    ).count() == 0
    resized.unpersist()

    from weather_monitoring_spark.operators.multimodal import chunk_audio

    chunks = chunk_audio(assets, chunk_bytes=8)
    c = chunks.filter(F.col("chunk_idx") == 0).first()
    assert c.byte_start == 0 and c.byte_len == 8 and 0.0 <= c.mean_level <= 1.0
    # payloads are 32 bytes -> exactly 4 chunks per audio asset
    n_audio = assets.filter(F.col("kind") == "audio").count()
    assert chunks.count() == 4 * n_audio
    decoded.unpersist()
    assets.unpersist()


def test_multimodal_real_codec_is_explicitly_stubbed(spark):
    assets = synthetic_assets(spark, 6)
    with pytest.raises(Exception) as ei:
        decode_images(assets, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_cosine_blocked_gemm_equals_naive_plan(spark):
    """The distributed blocked-GEMM prefilter plan must produce EXACTLY
    the naive all-pairs result (same pairs, bit-identical cosines) — the
    guaranteed-recall margin made concrete, with no driver-side corpus
    staging anywhere in the plan."""
    from weather_monitoring_spark.operators.similarity import cosine_neardup_pairs

    emb = load_table(spark, SF_SMALL, "embeddings")
    fast = {(r.id_a, r.id_b): r.cosine for r in cosine_neardup_pairs(emb).collect()}
    naive = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_neardup_pairs(emb, method="naive").collect()
    }
    assert fast == naive
    # also exercise an uneven block count (empty/imbalanced blocks)
    odd = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_neardup_pairs(emb, n_blocks=5).collect()
    }
    assert odd == naive


def test_cosine_lsh_neardup_recall_and_exactness(spark):
    """The bucket-bounded near-dup path (the past-n^2 regime): every pair
    it returns must carry the exact fold cosine, and recall on the exact
    pair set must be substantial (probabilistic by design, not 100%)."""
    from weather_monitoring_spark.operators.similarity import (
        cosine_neardup_lsh,
        cosine_neardup_pairs,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    exact = {(r.id_a, r.id_b): r.cosine for r in cosine_neardup_pairs(emb).collect()}
    approx = {(r.id_a, r.id_b): r.cosine for r in cosine_neardup_lsh(emb).collect()}
    assert set(approx) <= set(exact)
    for k_, v in approx.items():
        assert v == exact[k_]
    assert exact and len(approx) / len(exact) >= 0.5


def test_simhash_blocked_equals_allpairs(spark):
    """Pigeonhole blocking is lossless for Hamming <= d: the blocked plan
    must return exactly the all-pairs result."""
    from weather_monitoring_spark.operators.dedup import simhash_neardup_pairs

    docs = load_table(spark, SF_SMALL, "documents")
    blocked = {
        (r.id_a, r.id_b): r.hamming for r in simhash_neardup_pairs(docs).collect()
    }
    allpairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(docs, method="allpairs").collect()
    }
    assert blocked == allpairs
    assert allpairs, "expected planted simhash near-dups in the fixture corpus"


def test_jaccard_verify_matches_unrestricted_on_candidates(spark):
    """ngram_jaccard_verify over LSH candidates must agree with the full
    inverted-index join wherever they overlap, and never exceed it."""
    from weather_monitoring_spark.operators.dedup import ngram_jaccard_verify

    docs = load_table(spark, SF_SMALL, "documents")
    cand = minhash_lsh_pairs(docs)
    verified = {
        (r.id_a, r.id_b): (r.shared, r.jaccard)
        for r in ngram_jaccard_verify(docs, cand).collect()
    }
    full = {
        (r.id_a, r.id_b): (r.shared, r.jaccard)
        for r in ngram_jaccard_pairs(docs).collect()
    }
    assert set(verified) <= set(full)
    for k_, v in verified.items():
        assert v == full[k_]
    assert verified


def test_stratified_sample_proportions_and_determinism(spark):
    from weather_monitoring_spark.plans.registry import all_queries

    spec = all_queries()["q60_stratified_sample"]
    s1 = spec.spark(spark, SF_SMALL)
    counts = {r.event_type: r["count"] for r in s1.groupBy("event_type").count().collect()}
    full = {
        r.event_type: r["count"]
        for r in load_table(spark, SF_SMALL, "events").groupBy("event_type").count().collect()
    }
    assert counts["purchase"] == full["purchase"]  # fraction 1.0 keeps all
    assert counts["click"] < full["click"] * 0.3   # downsampled hard
    # seeded -> identical across runs
    s2 = spec.spark(spark, SF_SMALL)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0


def test_sampleby_surface_seeded_stratified(spark):
    """The RNG-based sampleBy surface (kept out of the registry since its
    Bernoulli draws are engine-specific by design): seeded -> repeatable
    within Spark, per-stratum fractions honored."""
    ev = load_table(spark, SF_SMALL, "events")
    fracs = {"click": 0.1, "view": 0.1, "error": 1.0, "purchase": 1.0, "signup": 1.0}
    s1 = ev.sampleBy("event_type", fracs, seed=42)
    s2 = ev.sampleBy("event_type", fracs, seed=42)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    counts = {r.event_type: r["count"] for r in s1.groupBy("event_type").count().collect()}
    full = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert counts["purchase"] == full["purchase"]
    assert counts["click"] < full["click"] * 0.3


def test_deterministic_split_proportions(spark):
    from weather_monitoring_spark.plans.registry import all_queries

    df = all_queries()["q59_deterministic_split"].spark(spark, SF_SMALL)
    n = df.count()
    frac = {r.split: r["count"] / n for r in df.groupBy("split").count().collect()}
    assert abs(frac["train"] - 0.8) < 0.1
    assert abs(frac.get("val", 0) - 0.1) < 0.08
    assert abs(frac.get("test", 0) - 0.1) < 0.08


def test_oversample_sources_weights_and_drops(spark):
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.training_prep import oversample_sources

    docs = spark.createDataFrame(
        [(1, "keep2"), (2, "keep1"), (3, "drop0"), (4, "keep3")],
        "doc_id bigint, source string",
    )
    weight = F.expr("CAST(substring(source, 5) AS BIGINT)")
    out = oversample_sources(docs, weight).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r["copy"])
    assert sorted(by_id[1]) == [1, 2]
    assert by_id[2] == [1]
    assert 3 not in by_id  # weight 0 -> dropped
    assert sorted(by_id[4]) == [1, 2, 3]
    assert all(r["weight"] == len(by_id[r["doc_id"]]) for r in out)


def test_training_shard_writer_roundtrip(tmp_path, spark):
    from weather_monitoring_spark.operators.training_prep import (
        verify_training_shards,
        write_training_shards,
    )
    from weather_monitoring_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, budget=2_000).collect()
    assert len(manifest) > 1
    assert sum(m["n_docs"] for m in manifest) == docs.count()
    # every written shard matches its manifest row (counts, tokens, checksum)
    assert verify_training_shards(spark, out).count() == 0
    # shard files preserve global packing order within each shard
    import pyspark.sql.functions as F

    written = spark.read.parquet(out)
    w = written.filter(F.col("shard_id") == manifest[0]["shard_id"])
    cums = [r["cum_tokens"] for r in w.collect()]
    assert cums == sorted(cums)


def test_training_shard_writer_jsonl(tmp_path, spark):
    from weather_monitoring_spark.operators.training_prep import (
        verify_training_shards,
        write_training_shards,
    )
    from weather_monitoring_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "jsonl_shards")
    manifest = write_training_shards(docs, out, budget=2_000, file_format="json")
    assert manifest.count() > 1
    assert verify_training_shards(spark, out, file_format="json").count() == 0


def test_chunk_documents_covers_and_reconstructs(spark):
    """Chunk windows tile the token stream: chunk 0 starts at 0, strides
    are uniform, dropping each chunk's overlap prefix reconstructs the
    original token sequence exactly, and no chunk is empty or oversized."""
    from weather_monitoring_spark.operators.training_prep import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        chunk_documents,
    )
    from weather_monitoring_spark.functions.text import tokens_expr

    docs = load_table(spark, SF_SMALL, "documents")
    chunks = chunk_documents(docs).collect()
    assert chunks
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    by_doc: dict = {}
    for r in chunks:
        assert 1 <= r.n_tokens <= CHUNK_TOKENS
        assert r.chunk_start == r.chunk_idx * stride
        by_doc.setdefault(r.doc_id, []).append(r)
    originals = {
        r.doc_id: r.tk
        for r in docs.select("doc_id", tokens_expr("text").alias("tk")).collect()
    }
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        rebuilt: list[str] = []
        for r in rows:
            toks = r.chunk_text.split(" ")
            rebuilt.extend(toks if r.chunk_idx == 0 else toks[CHUNK_OVERLAP:])
        assert rebuilt == originals[doc_id], f"doc {doc_id} reconstruction"
    # every non-empty doc chunked
    assert set(by_doc) == {d for d, tk in originals.items() if tk}


def test_tfidf_topk_ranks_rare_terms_over_common(spark):
    """A term appearing in every document (df == N) scores exactly tf, so
    any equally-frequent rarer term must outrank it; ranks are 1..k."""
    from weather_monitoring_spark.operators.textops import tfidf_topk

    docs = load_table(spark, SF_SMALL, "documents")
    n_docs = docs.count()
    rows = tfidf_topk(docs).collect()
    assert rows
    for r in rows:
        assert 1 <= r.term_rank <= 5
        assert r.score == pytest.approx(r.tf * (n_docs / r.df))
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows_d in by_doc.values():
        rows_d.sort(key=lambda r: r.term_rank)
        scores = [r.score for r in rows_d]
        assert scores == sorted(scores, reverse=True)


def test_quantize_embeddings_error_bound_and_range(spark):
    """floor-quantization guarantees |x - q*scale| < scale elementwise;
    codes stay within the int8-style range [-128, 127]."""
    from weather_monitoring_spark.operators.embeddings import quantize_embeddings

    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = quantize_embeddings(emb).collect()
    assert rows
    for r in rows:
        assert r.scale > 0
        assert 0 <= r.max_abs_err < r.scale
        assert all(-128 <= q <= 127 for q in r.qvec)


def test_chunk_documents_runs_in_structured_streaming(tmp_path, spark):
    """Chunking is a stateless projection, so the SAME operator runs
    unchanged as a streaming transformation — documents flowing in from a
    stream chunk identically to a batch pass over the same rows."""
    from weather_monitoring_spark.operators.training_prep import chunk_documents

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(80))), (2, "short doc"), (3, "")],
        "doc_id bigint, text string",
    )
    batch.write.parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (
        chunk_documents(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.n_tokens, r.chunk_text)
        for r in spark.read.parquet(out).collect()
    }
    batched = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.n_tokens, r.chunk_text)
        for r in chunk_documents(batch).collect()
    }
    assert streamed == batched
    assert any(k[0] == 1 for k in streamed) and any(k[0] == 2 for k in streamed)
    assert not any(k[0] == 3 for k in streamed)  # empty doc -> no chunks


def test_cap_per_group_is_deterministic_and_capped(spark):
    """Domain capping keeps <= k rows per group, ranks are contiguous
    from 1, and the kept id set is a pure function of the ids (same
    result when recomputed from a reshuffled input)."""
    from weather_monitoring_spark.operators.training_prep import cap_per_group

    docs = load_table(spark, SF_SMALL, "documents")
    capped = cap_per_group(docs, "source", 7)
    rows = capped.collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src_rows in by_src.values():
        assert len(src_rows) <= 7
        assert sorted(r.group_rank for r in src_rows) == list(
            range(1, len(src_rows) + 1)
        )
    again = {
        (r.source, r.doc_id)
        for r in cap_per_group(docs.repartition(13), "source", 7).collect()
    }
    assert {(r.source, r.doc_id) for r in rows} == again


def test_corpus_report_totals_match_corpus(spark):
    from weather_monitoring_spark.functions.text import tokens_expr
    from weather_monitoring_spark.operators.textops import corpus_report

    docs = load_table(spark, SF_SMALL, "documents")
    rep = corpus_report(docs).collect()
    assert sum(r.n_docs for r in rep) == docs.count()
    total_tokens = docs.select(
        F.sum(F.size(tokens_expr("text")).cast("long")).alias("t")
    ).first()["t"]
    assert sum(r.n_tokens for r in rep) == total_tokens
    for r in rep:
        assert r.chars_per_doc == r.n_chars / r.n_docs


def test_sample_exact_k_is_deterministic_and_exact(spark):
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.training_prep import sample_exact_k
    from weather_monitoring_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(r["doc_id"] for r in sample_exact_k(docs, 50).collect())
    b = sorted(
        r["doc_id"]
        for r in sample_exact_k(docs.repartition(13, F.col("source")), 50).collect()
    )
    assert len(a) == 50 and a == b  # exact size; partitioning-independent


def test_trim_distribution_tails_known_frame(spark):
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.training_prep import (
        trim_distribution_tails,
    )

    df = spark.createDataFrame(
        [(i, i) for i in range(1, 101)], "doc_id bigint, v bigint"
    )
    out = trim_distribution_tails(df, F.col("v"), lo_pct=5, hi_pct=95)
    rows = out.collect()
    # ceil(100*5/100)=5 -> v_lo=5; ceil(100*95/100)=95 -> v_hi=95
    assert all(r["v_lo"] == 5 and r["v_hi"] == 95 for r in rows)
    assert sorted(r["v"] for r in rows) == list(range(5, 96))

    # degenerate single-valued distribution keeps everything
    one = spark.createDataFrame([(i, 7) for i in range(20)], "doc_id bigint, v bigint")
    kept = trim_distribution_tails(one, F.col("v")).collect()
    assert len(kept) == 20 and all(r["v_lo"] == r["v_hi"] == 7 for r in kept)


def test_lm_score_known_fractions(spark):
    from weather_monitoring_spark.operators.textops import bigram_lm, lm_score

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "a b a b"), (4, "solo")],
        ["doc_id", "text"],
    )
    lm = bigram_lm(docs.filter("doc_id = 1"))  # knows ab, bc, cd (count 1 each)
    out = {r.doc_id: r for r in lm_score(docs, lm).collect()}
    assert set(out) == {1, 2, 3}  # <2 tokens -> no bigrams -> excluded
    assert (out[1].n_bigrams, out[1].n_known, out[1].c_evidence) == (3, 3, 3)
    assert out[1].known_frac == 1.0
    assert (out[2].n_bigrams, out[2].n_known, out[2].c_evidence) == (3, 1, 1)
    assert out[2].known_frac == 1 / 3
    # multiplicity counts: "a b a b" has bigrams ab, ba, ab
    assert (out[3].n_bigrams, out[3].n_known, out[3].c_evidence) == (3, 2, 2)


def test_mixture_weights_semantics(spark):
    """p sums to 1 (up to fold rounding), small sources get boost > 1,
    large sources < 1, and ordering by p follows ordering by n_tokens."""
    from weather_monitoring_spark.operators.training_prep import mixture_weights

    docs = load_table(spark, SF_SMALL, "documents")
    rows = mixture_weights(docs).collect()
    assert len(rows) == docs.select("source").distinct().count()
    assert abs(sum(r.p for r in rows) - 1.0) < 1e-12
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    by_p = sorted(rows, key=lambda r: r.p)
    assert [r.source for r in by_tokens] == [r.source for r in by_p]
    if by_tokens[0].n_tokens != by_tokens[-1].n_tokens:
        assert by_tokens[0].boost > 1.0 > by_tokens[-1].boost
    tok_total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert abs(r.boost - r.p / (r.n_tokens / tok_total)) < 1e-12


def test_custom_lsh_meets_stock_ml_minhashlsh_baseline(spark):
    """SURVEY §7.1 M6 named ml.feature.MinHashLSH as the stock route; the
    engine ships a custom md5-derived MinHash instead because the stock
    hash family is RNG-seeded (not oracle-checkable) and its
    approxSimilarityJoin needs a vectorizer pipeline. This test proves
    the custom path gives up nothing: both implementations must catch
    every planted exact-Jaccard >= 0.9 near-dup pair on the fixture
    corpus (the stock run pins its seed for reproducibility)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from pyspark.sql import functions as F

    from weather_monitoring_spark.functions.text import shingles_expr, tokens_expr

    docs = load_table(spark, SF_SMALL, "documents")
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert truth, "fixture must contain planted near-duplicates"

    # custom path (oracle-checkable md5 family)
    custom = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()}
    assert truth <= custom

    # stock path: shingle sets -> binary CountVectorizer -> MinHashLSH
    sh = (
        docs.withColumn("_tk", tokens_expr("text"))
        .select("doc_id", F.array_distinct(shingles_expr("_tk")).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    cv = CountVectorizer(
        inputCol="sh", outputCol="features", binary=True, minDF=1.0
    ).fit(sh)
    feat = cv.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=7
    ).fit(feat)
    # jaccard distance threshold 0.1 == similarity 0.9
    stock_pairs = (
        lsh.approxSimilarityJoin(feat, feat, 0.100001, distCol="dist")
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .collect()
    )
    stock = {(r.id_a, r.id_b) for r in stock_pairs}
    assert truth <= stock


# ---- round-4: threshold-matched LSH + hot-bucket/hot-block guards --------


def _det_words(seed: str, n: int) -> list[str]:
    """Deterministic unique 'words' — md5-derived, no RNG (the repo-wide
    reproducibility rule)."""
    import hashlib

    return [hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8] for i in range(n)]


def _planted_midband_corpus(spark):
    """60 doc pairs with exact 3-gram Jaccard planted in [0.5, 0.6]: each
    pair shares a 60-word base; the variant replaces m in {5, 6} words at
    positions spaced >= 10 apart, killing exactly 3m shingles per side
    (j = (58-3m)/(58+3m) -> 0.589 for m=5, 0.526 for m=6)."""
    rows = []
    for p in range(60):
        base = _det_words(f"pair{p}", 60)
        m = 5 if p % 2 == 0 else 6
        variant = list(base)
        for r_i in range(m):
            variant[5 + 10 * r_i] = f"rep{p}x{r_i}"
        rows.append((2 * p, " ".join(base)))
        rows.append((2 * p + 1, " ".join(variant)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_recall_at_declared_threshold(spark):
    """The round-3 verdict's finding #3 made concrete: with the S-curve
    aligned to JACCARD_THRESHOLD (K=81, b=27, r=3 -> p(0.5)=0.973,
    p(0.6)=0.9986), planted pairs with exact Jaccard in [0.5, 0.6] must
    be caught at >= 90% recall (the old K=12/b=4/r=3 config caught
    ~41-62% of this band). Deterministic: md5-derived corpus + md5 hash
    family, so the measured recall is a fixed property of the code."""
    docs = _planted_midband_corpus(spark)
    truth = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=JACCARD_THRESHOLD, max_shingle_df=None
        ).collect()
        # keep only the planted (base, variant) pairs — cross-pair overlap
        # is ~zero by construction but filter to be exact about the claim
        if r.id_b == r.id_a + 1 and r.id_a % 2 == 0
    }
    assert len(truth) == 60, f"expected 60 planted pairs, got {len(truth)}"
    assert all(0.5 <= j <= 0.65 for j in truth.values()), sorted(truth.values())
    candidates = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()}
    recall = len(truth.keys() & candidates) / len(truth)
    assert recall >= 0.9, f"mid-band recall {recall} below 0.9"


def _identical_plus_background(spark, n_dup: int, n_bg: int):
    """n_dup byte-identical docs (ids 0..n_dup-1) + n_bg unique-word docs."""
    from pyspark.sql import functions as F

    dup_text = " ".join(_det_words("boilerplate", 60))
    dup = spark.range(n_dup).select(
        F.col("id").alias("doc_id"), F.lit(dup_text).alias("text")
    )
    bg = spark.range(n_dup, n_dup + n_bg).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 60), i -> "
            "substring(md5(concat('bg', id, ':', i)), 1, 8)))"
        ).alias("text"),
    )
    return dup.unionByName(bg)


def test_minhash_hot_bucket_cap_bounds_candidates(spark):
    """Verdict finding #2: mass-duplicated boilerplate puts thousands of
    docs into identical band buckets across all bands; the band self-join
    must NOT produce m^2 rows. With the hot-bucket guard the 10k
    identical docs yield exactly the 9,999 star pairs (min-id keeper) —
    not the ~5*10^7 of the uncapped join — and every background doc
    stays un-paired."""
    docs = _identical_plus_background(spark, n_dup=10_000, n_bg=500)
    pairs = minhash_lsh_pairs(docs).collect()
    assert len(pairs) == 9_999, f"expected 9,999 star pairs, got {len(pairs)}"
    assert all(p.id_a == 0 and 1 <= p.id_b <= 9_999 for p in pairs)


def test_minhash_hot_bucket_cap_preserves_survivors(spark):
    """On a corpus small enough to run the uncapped join, capped and
    uncapped candidate sets must induce IDENTICAL dedup survivors (a doc
    is dropped iff it appears as id_b): the star routing loses only
    pair-set shape, never the survivor semantics, for the
    identical-document case that creates hot buckets."""
    docs = _identical_plus_background(spark, n_dup=200, n_bg=100)
    capped = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, max_band_df=50).collect()}
    uncapped = {
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, max_band_df=None).collect()
    }
    assert capped <= uncapped
    assert len(capped) == 199 and len(uncapped) == 199 * 200 // 2
    assert {b for _, b in capped} == {b for _, b in uncapped}  # same dropped set


def test_minhash_hot_bucket_cutoff_counts_full_corpus(spark):
    """r15 ADVICE (medium): the auto band-df cutoff must be derived from
    the FULL corpus (count(*) over docs — what the DuckDB oracle's bcut
    does), not from the banded rows, which exclude null-text docs. With
    500 null-text docs in a 10,000-doc corpus, a 99-doc identical group
    sits exactly in the discriminating window: full-corpus cutoff
    ceil(sqrt(10000)) = 100 keeps its buckets COLD (full 99*98/2 clique
    from the self-join), while the buggy non-null count gives
    ceil(sqrt(9500)) = 98 and mis-routes it through star pairs (98)."""
    from pyspark.sql import functions as F

    dup_text = " ".join(_det_words("nullcut", 60))
    dup = spark.range(99).select(
        F.col("id").alias("doc_id"), F.lit(dup_text).alias("text")
    )
    nulls = spark.range(99, 599).select(
        F.col("id").alias("doc_id"), F.lit(None).cast("string").alias("text")
    )
    bg = spark.range(599, 10_000).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 60), i -> "
            "substring(md5(concat('bgn', id, ':', i)), 1, 8)))"
        ).alias("text"),
    )
    docs = dup.unionByName(nulls).unionByName(bg)
    clique = [
        r
        for r in minhash_lsh_pairs(docs).collect()
        if r.id_a < 99 and r.id_b < 99
    ]
    assert len(clique) == 99 * 98 // 2, (
        f"expected the full 4,851-pair clique (cold buckets under the "
        f"full-corpus cutoff), got {len(clique)}"
    )


def test_cosine_lsh_threshold_matched_params_and_hot_bucket_cap(spark):
    """Round-4 hardening of the embedding near-dup self-join: (p, L)
    derive from the threshold (sharp thresholds get sharp buckets —
    0.95 -> 24-bit tables, vs the ANN path's fixed 4-bit tables whose
    n/16 buckets made the self-join constant-factor quadratic), and
    mass-identical vectors divert to star candidates through the exact
    re-scorer. Planted: 300 byte-identical vectors + 200 distinct; the
    identical cluster must come back as exactly 299 star pairs at
    cosine 1.0, not C(300,2)."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.similarity import (
        cosine_neardup_lsh,
        lsh_neardup_params,
    )

    p_sharp, _ = lsh_neardup_params(0.95)
    p_weak, _ = lsh_neardup_params(0.4)
    assert p_sharp > p_weak >= 4  # sharper threshold -> sharper buckets

    dup = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> CAST(1.0 + i * 0.25 AS FLOAT))"
        ).alias("embedding"),
    )
    bg = spark.range(300, 500).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> "
            "CAST(CAST(conv(substring(md5(concat(id, ':', i)), 1, 8), 16, 10) AS DOUBLE)"
            " / 4294967296.0 - 0.5 AS FLOAT))"
        ).alias("embedding"),
    )
    emb = dup.unionByName(bg)
    pairs = cosine_neardup_lsh(emb, threshold=0.95, max_bucket_df=50).collect()
    dup_pairs = [p for p in pairs if p.id_a < 300 and p.id_b < 300]
    assert len(dup_pairs) == 299, f"expected 299 star pairs, got {len(dup_pairs)}"
    assert all(p.id_a == 0 and abs(p.cosine - 1.0) < 1e-12 for p in dup_pairs)
    # random background vectors are ~orthogonal: none clear 0.95
    assert all(p.id_a < 300 for p in pairs)


def test_simhash_hot_block_cap_bounds_and_preserves_survivors(spark):
    """The SimHash scale-mode guard (max_block_df): identical docs flood
    every Manku table block; capped mode diverts them to exact-signature
    star pairs (hamming 0) — linear, same dropped set as the exact plan,
    and a strict subset of its pairs."""
    from weather_monitoring_spark.operators.dedup import simhash_neardup_pairs

    docs = _identical_plus_background(spark, n_dup=200, n_bg=100)
    capped = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(docs, max_block_df=50).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(docs).collect()
    }
    assert set(capped) <= set(exact)
    assert len(capped) == 199 and all(h == 0 for h in capped.values())
    assert len(exact) == 199 * 200 // 2
    assert {b for _, b in capped} == {b for _, b in exact}
    # a no-hot-blocks corpus: cap high enough -> bit-identical to exact
    bg_only = _identical_plus_background(spark, n_dup=1, n_bg=150)
    assert (
        {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_neardup_pairs(bg_only, max_block_df=5000).collect()
        }
        == {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_neardup_pairs(bg_only).collect()
        }
    )


# ---- round-4: URL / domain curation --------------------------------------


def test_url_canonicalization_known_cases(spark):
    """Each canonicalization rule against a hand-checked table: case,
    www., default ports, tracker params, param ordering, trailing
    slash, fragments, ccTLD second-level domains."""
    from weather_monitoring_spark.operators.urlops import canonicalize_urls

    cases = [
        (1, "HTTPS://WWW.Foo.Example.co.uk:443/en/doc/5/?b=2&a=1&utm_source=x#f",
         "https://foo.example.co.uk/en/doc/5?a=1&b=2", "example.co.uk"),
        (2, "https://foo.example.com/", "https://foo.example.com/", "example.com"),
        (3, "http://A.B.com:80/x?utm_campaign=z&z=9&ref=h",
         "http://a.b.com/x?z=9", "b.com"),
        (4, "https://example.com", "https://example.com/", "example.com"),
        (5, "https://sub.example.com/a?fbclid=1&gclid=2&msclkid=3",
         "https://sub.example.com/a", "example.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _, _ in cases], "doc_id long, url string"
    )
    got = {r.doc_id: (r.canon_url, r.domain) for r in canonicalize_urls(df).collect()}
    for i, _, canon, dom in cases:
        assert got[i] == (canon, dom), (i, got[i], canon, dom)


#: PSL truth table (url -> registrable domain): normal ccTLD second
#: levels, wildcard rules (*.ck/*.kawasaki.jp), exception rules
#: (!www.ck/!city.kawasaki.jp), private-section platform suffixes,
#: hosts that ARE public suffixes (NULL), single-label hosts (NULL),
#: and the implicit-'*' default.
PSL_CASES = {
    "https://www.Example.co.uk/x": "example.co.uk",
    "https://a.b.example.com/": "example.com",
    "https://sub.shop.example.com.br/": "example.com.br",
    "https://example.com.br/": "example.com.br",
    "https://co.uk/": None,
    "https://example.com/": "example.com",
    "https://foo.ck/": None,  # *.ck => foo.ck IS a public suffix
    "https://bar.foo.ck/": "bar.foo.ck",
    "https://www.ck/": "www.ck",  # !www.ck beats *.ck
    "https://x.www.ck/": "www.ck",
    "https://city.kawasaki.jp/": "city.kawasaki.jp",  # !city.kawasaki.jp
    "https://a.city.kawasaki.jp/": "city.kawasaki.jp",
    "https://b.kawasaki.jp/": None,  # *.kawasaki.jp
    "https://x.b.kawasaki.jp/": "x.b.kawasaki.jp",
    "https://user.github.io/": "user.github.io",  # private section
    "https://a.user.github.io/": "user.github.io",
    "https://bucket.s3.amazonaws.com/": "bucket.s3.amazonaws.com",
    "https://localhost/": None,
    "https://blog.co.jp/": "blog.co.jp",
    "https://www.example.com/": "example.com",
    "https://shop.example.co.uk:443/": "example.co.uk",
}


def test_psl_domain_truth_table_spark(spark):
    """Full publicsuffix.org matching semantics on the Spark side:
    every PSL_CASES row, incl. wildcard/exception precedence and the
    NULL (host-is-a-suffix) contract."""
    from weather_monitoring_spark.operators.urlops import domain_expr

    df = spark.createDataFrame(
        [(u,) for u in PSL_CASES], "url string"
    ).select("url", domain_expr("url").alias("d"))
    got = {r["url"]: r["d"] for r in df.collect()}
    assert got == PSL_CASES


def test_psl_domain_truth_table_duckdb(duck):
    """The oracle fragment computes the identical table from the SAME
    vendored PSL file (cross-engine mirror of the compiled CASE)."""
    from weather_monitoring_spark.operators.urlops import o_domain

    for url, want in PSL_CASES.items():
        got = duck.execute(f"SELECT {o_domain(repr(url))}").fetchone()[0]
        assert got == want, (url, got, want)


def test_psl_parser_shape():
    """The vendored snapshot parses into the rule families the matcher
    compiles: 2/3-label normals, 1/2-label wildcard bases, the www.ck
    and city.*.jp exceptions; single-label rules are dropped (implicit
    '*' default covers them)."""
    from weather_monitoring_spark.operators.urlops import load_psl

    normals, wildcards, exceptions = load_psl()
    assert "co.uk" in normals[2] and "s3.amazonaws.com" in normals[3]
    assert "ck" in wildcards[1] and "kawasaki.jp" in wildcards[2]
    assert "www.ck" in exceptions[2] and "city.kawasaki.jp" in exceptions[3]
    assert 1 not in normals


def test_url_dedup_and_domain_filter(spark):
    """Distinct raw URLs that canonicalize identically form one dedup
    group (min-id keeper); filter_by_domains drops exactly the
    block-listed registrable domain's docs via a broadcast anti join."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.urlops import (
        filter_by_domains,
        url_dedup,
    )

    df = spark.createDataFrame(
        [
            (10, "https://WWW.news.example.com/a/?utm_source=feed"),
            (11, "https://news.example.com/a"),
            (12, "https://news.example.com:443/a/#top"),
            (20, "https://spam.bad-domain.com/x"),
            (21, "https://other.bad-domain.com/y"),
            (30, "https://keep.example.org/z"),
            (40, None),  # URI-less pages (damaged WARC header): unknown
            (41, None),  # identity — must NOT dedup against each other
        ],
        "doc_id long, url string",
    )
    groups = {r.keeper_doc_id: r.n_copies for r in url_dedup(df).collect()}
    assert groups[10] == 3  # 10, 11, 12 collapse onto one canonical URL
    assert groups[20] == 1 and groups[21] == 1 and groups[30] == 1
    # NULL canonical urls are each their own keeper (md5(NULL) is NULL;
    # one GROUP BY NULL group previously deleted all but one such doc)
    assert groups[40] == 1 and groups[41] == 1

    blocked = spark.createDataFrame([("bad-domain.com",)], "domain string")
    kept = {r.doc_id for r in filter_by_domains(df, blocked).collect()}
    assert kept == {10, 11, 12, 30, 40, 41}


def test_distributed_cumsum_partitioning_is_pinned(spark):
    """Regression pin for the range-boundary consistency bug: Spark's
    RangePartitioner seeds its boundary sampling with the RDD id, so
    the offsets leg and the join leg of distributed_cumsum can land
    DIFFERENT boundaries whenever exchange reuse does not fire (seen as
    manifest/file disagreement in the shard writer at local[32]). The
    fix pins the post-exchange frame with a lazy localCheckpoint; this
    asserts the pin is present (a LogicalRDD node replaces the live
    range exchange in the analyzed plan)."""
    import pyspark.sql.functions as F

    from weather_monitoring_spark.operators.training_prep import distributed_cumsum

    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    cum = distributed_cumsum(df, "k", "v")
    analyzed = cum._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in analyzed, "cumsum exchange is no longer pinned"


def test_training_shard_writer_roundtrip_shuffled_many_partitions(tmp_path, spark):
    """The shuffle=True (md5-ordered) packing path, stressed with a
    32-way range partitioning: manifest and written files must agree
    exactly — the original boundary-consistency failure surfaced on
    precisely this write-then-verify shape."""
    import pyspark.sql.functions as F

    from weather_monitoring_spark.operators.training_prep import (
        verify_training_shards,
        write_training_shards,
    )

    docs = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 20), i -> "
            "substring(md5(concat(id, ':w', i)), 1, 8)))"
        ).alias("text"),
    )
    out = str(tmp_path / "shards")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        manifest = write_training_shards(docs, out, budget=10_000, shuffle=True)
        assert manifest.count() > 3
        assert verify_training_shards(spark, out).count() == 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_estimate_lsh_recall_on_planted_neardups(spark):
    """The recall audit measures what the banding actually catches:
    planted j~0.95 pairs (one word changed in 60) are all in the exact
    truth set and essentially all banded -> recall ~ 1.0; and the
    no-evidence case returns NULL, not a fake 1.0."""
    from weather_monitoring_spark.operators.dedup import estimate_lsh_recall

    n = 300
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            # ids x and x+150 share 59 of 60 words
            f"concat_ws(' ', transform(sequence(1, 60), i -> "
            f"substring(md5(concat(id % {n // 2}, ':w', "
            f"CASE WHEN i = 3 AND id >= {n // 2} THEN -id ELSE i END)), 1, 8)))"
        ).alias("text"),
    )
    row = estimate_lsh_recall(docs, sample_k=n).collect()[0]
    assert row["n_true"] == n // 2
    assert row["recall"] >= 0.95

    unrelated = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 60), i -> "
            "substring(md5(concat(id, ':u', i)), 1, 8)))"
        ).alias("text"),
    )
    empty = estimate_lsh_recall(unrelated, sample_k=50).collect()[0]
    assert empty["n_true"] == 0 and empty["recall"] is None


# ---------------- feature-hashing vectorizer --------------------------------


def test_hashed_tf_vectors_counts_and_unit_norm(spark):
    from weather_monitoring_spark.operators.embeddings import hashed_tf_vectors

    rows = [(1, "spark spark window"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in hashed_tf_vectors(df, dim=8).collect()}
    v = out[1]["vec"]
    assert sum(v) == 3.0 and out[1]["n_tokens"] == 3
    assert sorted(v, reverse=True)[0] == 2.0  # the doubled token's bucket
    assert out[2]["vec"] == [0.0] * 8 and out[2]["n_tokens"] == 0
    unit = {r["doc_id"]: r for r in hashed_tf_vectors(df, dim=8, unit=True).collect()}
    import math

    nrm = math.sqrt(sum(x * x for x in unit[1]["vec"]))
    assert nrm == pytest.approx(1.0, abs=1e-12)
    assert unit[3]["vec"] == [0.0] * 8  # empty doc: zero vector, no NaN


def test_hashed_tf_vectors_feed_the_clustering_family(spark):
    """The bridge in action: planted copy groups of TEXT cluster
    together through kmeans over hashed vectors — no embedding model."""
    from weather_monitoring_spark.operators.clustering import kmeans_embeddings
    from weather_monitoring_spark.operators.embeddings import hashed_tf_vectors

    rows = []
    for g, base in enumerate(
        ["alpha beta gamma delta", "epsilon zeta eta theta", "iota kappa lambda mu"]
    ):
        for i in range(10):
            rows.append((g * 100 + i, base + f" filler{g}"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    vecs = hashed_tf_vectors(df, dim=16, unit=True).select(
        F.col("doc_id").alias("vec_id"),
        F.col("vec").cast("array<float>").alias("embedding"),
    )
    out = kmeans_embeddings(vecs, n_clusters=3, n_iters=3)
    groups = {}
    for r in out.collect():
        groups.setdefault(r["vec_id"] // 100, set()).add(r["cluster"])
    # every copy group lands in exactly one cluster
    assert all(len(c) == 1 for c in groups.values())


def test_hashed_tf_vectors_plan_is_exchange_free(spark):
    from weather_monitoring_spark.operators.embeddings import hashed_tf_vectors

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    # both methods: zero shuffle; the expr twin is additionally Python-free
    arrow_plan = (
        hashed_tf_vectors(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in arrow_plan
    expr_plan = (
        hashed_tf_vectors(df, method="expr")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in expr_plan and "Python" not in expr_plan
    import pytest

    with pytest.raises(ValueError, match="dim"):
        hashed_tf_vectors(df, dim=0)
    with pytest.raises(ValueError, match="method"):
        hashed_tf_vectors(df, method="nope")


def test_hashed_tf_arrow_and_expr_paths_are_bit_equal(spark):
    """np.bincount + numpy float64 normalize vs the pure-expr twin:
    identical bits in both modes (IEEE sqrt/divide are correctly
    rounded; counts and squared norms are exact ints)."""
    from weather_monitoring_spark.operators.embeddings import hashed_tf_vectors

    rows = [(1, "spark spark window batch"), (2, None), (3, ""),
            (4, "one two three four five six seven eight " * 4)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for unit in (False, True):
        a = hashed_tf_vectors(df, dim=16, unit=unit).orderBy("doc_id").collect()
        e = (
            hashed_tf_vectors(df, dim=16, unit=unit, method="expr")
            .orderBy("doc_id")
            .collect()
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in e]


def test_semantic_decontaminate_flags_planted_paraphrase(spark):
    """A train vector nearly identical to a bench vector flags even when
    (in the text world) no 3-gram would overlap; orthogonal vectors stay
    clean with an explicit zero-filled verdict."""
    from weather_monitoring_spark.operators.training_prep import (
        semantic_decontaminate,
    )

    def vec(*nonzero):
        v = [0.0] * 8
        for i, x in nonzero:
            v[i] = x
        return v

    train = spark.createDataFrame(
        [
            (1, vec((0, 1.0), (1, 0.1))),   # ~bench item 0 -> flagged
            (2, vec((3, 1.0))),             # orthogonal -> clean
            (3, vec((0, -1.0))),            # anti-parallel -> clean
        ],
        "vec_id bigint, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(0, vec((0, 1.0)))], "vec_id bigint, embedding array<float>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(train, bench, threshold=0.9).collect()
    }
    assert out[1]["contaminated"] and out[1]["max_cos"] > 0.99
    assert out[1]["n_bench_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_bench_hits"] == 0
    assert out[2]["max_cos"] is None
    assert not out[3]["contaminated"]

    # train ids must be non-negative (bench maps into the negative space)
    bad = spark.createDataFrame(
        [(-5, vec((0, 1.0)))], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="non-negative"):
        semantic_decontaminate(bad, bench)
    # symmetric: a NEGATIVE bench id would alias into the train side
    # after the -id-1 mapping and silently corrupt verdicts
    with pytest.raises(ValueError, match="bench vec_id"):
        semantic_decontaminate(train, bad)


def test_semantic_decontaminate_cross_equals_blocked_bitwise(spark):
    """The r10 cross-side path (GEMM prefilter + exact fold re-score
    against the broadcast bench matrix) must produce BIT-EQUAL verdicts,
    max_cos included, to the union formulation — same exactness
    discipline, ~n_train/n_bench less work."""
    import math

    from weather_monitoring_spark.operators.training_prep import (
        semantic_decontaminate,
    )

    def vec(seed, dim=8):
        # deterministic, non-trivial float32-ish values
        return [math.sin(seed * 7.3 + j * 1.7) for j in range(dim)]

    train = spark.createDataFrame(
        [(i, vec(i)) for i in range(60)],
        "vec_id bigint, embedding array<float>",
    )
    # bench: three train-adjacent vectors + one orthogonal-ish
    bench = spark.createDataFrame(
        [(0, vec(3)), (1, vec(17)), (2, vec(44)), (3, [1.0] + [0.0] * 7)],
        "vec_id bigint, embedding array<float>",
    )
    rows = lambda df: sorted(
        (r["vec_id"], r["contaminated"], r["max_cos"], r["n_bench_hits"])
        for r in df.collect()
    )
    a = rows(semantic_decontaminate(train, bench, threshold=0.9,
                                    method="cross"))
    b = rows(semantic_decontaminate(train, bench, threshold=0.9,
                                    method="blocked"))
    assert a == b  # bit-equal max_cos included
    assert any(r[1] for r in a)  # the planted neighbors flagged

    # auto picks cross below the cap and falls back above it; forcing
    # cross above the cap is an audit-grade error
    import weather_monitoring_spark.operators.training_prep as tp
    import pytest

    old = tp.SEMANTIC_CROSS_BENCH_CAP
    try:
        tp.SEMANTIC_CROSS_BENCH_CAP = 2
        with pytest.raises(ValueError, match="closure cap"):
            semantic_decontaminate(train, bench, method="cross")
        c = rows(semantic_decontaminate(train, bench, threshold=0.9))
        assert c == b  # auto fell back to the union path, same answer
    finally:
        tp.SEMANTIC_CROSS_BENCH_CAP = old

    # empty bench: every train row explicitly clean
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = semantic_decontaminate(train, empty).collect()
    assert len(out) == 60
    assert all(not r["contaminated"] and r["n_bench_hits"] == 0 for r in out)


def test_semantic_cross_cap_is_byte_aware(spark, monkeypatch):
    """r11 (verdict #1): cross-path admission is budgeted in BYTES
    (rows x dim x 8), not rows alone — the same bench row count that
    passes at a narrow dim must fall back (or, forced, raise) at a wide
    dim, so a dim-1024 bench can never collect ~800 MB to the driver.
    Auto's fallback stays bit-equal to the union path."""
    import pytest

    import weather_monitoring_spark.operators.training_prep as tp
    from weather_monitoring_spark.operators.training_prep import (
        semantic_decontaminate,
    )

    monkeypatch.setattr(tp, "SEMANTIC_CROSS_BENCH_BYTES", 1 << 12)  # 4 KiB

    def frames(dim):
        train = spark.createDataFrame(
            [(i, [float((i * 13 + j * 7) % 11 - 5) for j in range(dim)])
             for i in range(12)],
            "vec_id bigint, embedding array<float>",
        )
        bench = spark.createDataFrame(
            [(i, [float((i * 17 + j * 3) % 11 - 5) for j in range(dim)])
             for i in range(10)],
            "vec_id bigint, embedding array<float>",
        )
        return train, bench

    # dim 8: the 4 KiB budget admits 4096/64 = 64 rows -> the 10-row
    # bench takes the cross path
    train, bench = frames(8)
    assert semantic_decontaminate(train, bench, method="cross").count() == 12

    # dim 128: the SAME row count now exceeds 4096/1024 = 4 rows
    train, bench = frames(128)
    with pytest.raises(ValueError, match="closure cap .* dim 128"):
        semantic_decontaminate(train, bench, method="cross")

    rows = lambda df: sorted(
        (r["vec_id"], r["contaminated"], r["max_cos"], r["n_bench_hits"])
        for r in df.collect()
    )
    auto = rows(semantic_decontaminate(train, bench, threshold=0.95))
    blocked = rows(
        semantic_decontaminate(train, bench, threshold=0.95, method="blocked")
    )
    assert auto == blocked  # auto fell back to the union path, bit-equal


def test_semantic_cross_admission_is_atomic(spark, monkeypatch, tmp_path):
    """r12 advisor: the id-only admission probe and the embedding
    collect are separate jobs, so a non-deterministic / concurrently
    growing bench lineage can hand the collect MORE rows than the probe
    admitted — the collect itself must stay LIMIT-bounded and the cap
    enforced on what actually arrived. Simulated with a mapInPandas
    bench whose row count grows on its third lineage evaluation (dim
    probe, id count, collect)."""
    import pytest

    import weather_monitoring_spark.operators.training_prep as tp
    from weather_monitoring_spark.operators.training_prep import (
        semantic_decontaminate,
    )

    monkeypatch.setattr(tp, "SEMANTIC_CROSS_BENCH_CAP", 4)
    counter = str(tmp_path / "evals")

    def grow(batches):
        import os

        import pandas as pd

        for _ in batches:  # drain the single input partition
            pass
        n = 0
        if os.path.exists(counter):
            with open(counter) as f:
                n = int(f.read() or 0)
        with open(counter, "w") as f:
            f.write(str(n + 1))
        rows = 2 if n < 2 else 6  # grows between probe and collect
        yield pd.DataFrame(
            {
                "vec_id": list(range(rows)),
                "embedding": [[1.0, 0.0, 0.0, 0.0]] * rows,
            }
        )

    bench = spark.range(0, 1, 1, 1).mapInPandas(
        grow, "vec_id bigint, embedding array<float>"
    )
    train = spark.createDataFrame(
        [(i, [0.0, 1.0, 0.0, 0.0]) for i in range(3)],
        "vec_id bigint, embedding array<float>",
    )
    # probe sees 2 <= 4 and admits; the bounded collect then receives
    # 5 (= cap+1) rows -> the grown bench is rejected, not collected
    with pytest.raises(ValueError, match="closure cap"):
        semantic_decontaminate(train, bench, method="cross")
