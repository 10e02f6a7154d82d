"""BM25 ranked retrieval (operators/retrieval.py) — ranking behavior,
determinism, and the single-broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_monitoring_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_ranking_prefers_tf_and_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, "spark window batch spark spark"),
            (2, "window window window other words fill this doc to longer length"),
            (3, "entirely unrelated content lives here"),
            (4, "spark appears once in a very long document " + "filler " * 50),
            (5, None),
        ],
    )
    out = bm25_topk(df, ("spark", "window"), top_k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1  # highest tf, short doc
    assert set(ids) == {1, 2, 4}  # non-matching docs never returned
    assert all(out[i]["score"] >= out[i + 1]["score"] for i in range(len(out) - 1))


def test_bm25_rare_terms_outweigh_common_ones(spark):
    # 'rare' appears in 1 of 12 docs, 'common' in all: one rare hit must
    # outrank one common hit at equal tf and dl.
    rows = [(i, "common word here") for i in range(1, 12)]
    rows.append((12, "rare word here"))
    rows.append((13, "common rare here"))  # both -> top
    df = _docs(spark, rows)
    out = bm25_topk(df, ("rare", "common"), top_k=13).collect()
    assert out[0]["doc_id"] == 13
    assert out[1]["doc_id"] == 12  # the pure-rare doc beats every common doc


def test_bm25_ties_break_on_doc_id(spark):
    rows = [(i, "same text everywhere") for i in (5, 3, 9, 1)]
    df = _docs(spark, rows)
    out = bm25_topk(df, ("same",), top_k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 3, 5]


def test_bm25_query_guards(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="empty"):
        bm25_topk(df, ())
    with pytest.raises(ValueError, match="never match"):
        bm25_topk(df, ("Upper",))
    with pytest.raises(ValueError, match="never match"):
        bm25_topk(df, ("two words",))


def test_bm25_plan_broadcasts_stats_and_heaps_topk(spark):
    df = _docs(spark, [(i, f"w{i} spark") for i in range(1, 40)])
    plan = (
        bm25_topk(df, ("spark",), top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the only exchange is the one-row stats broadcast — the corpus
    # itself never hash-partitions
    assert "Exchange hashpartitioning" not in plan
