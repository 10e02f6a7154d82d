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


def test_bm25_log_idf_matches_quantized_python_and_true_ln(spark):
    """idf="log" (the default): per-term idf equals the pure-Python
    replay of the SAME quantized tables bit-for-bit, and sits within
    the declared ln(1+1/BUCKETS) bound of the true Lucene idf."""
    import math
    from decimal import Decimal

    from weather_monitoring_spark.operators.retrieval import (
        BM25_LN_BUCKETS,
        ln2_multiple_strings,
        ln_mantissa_strings,
    )

    mant, ln2m = ln_mantissa_strings(), ln2_multiple_strings()

    def lnq(k: int) -> Decimal:
        b = k.bit_length() - 1
        t = (k * BM25_LN_BUCKETS) // (1 << b)
        return Decimal(ln2m[b]) + Decimal(mant[t - BM25_LN_BUCKETS])

    # corpus: term in 3 of 12 docs; one matching doc, tf=1, dl == avgdl
    rows = [(i, "zq filler here") for i in (1, 2, 3)]
    rows += [(i, "aa filler here") for i in range(4, 13)]
    out = bm25_topk(_docs(spark, rows), ("zq",), top_k=1).collect()
    n_docs, df = 12, 3
    idf_exact = float(lnq(2 * n_docs + 2) - lnq(2 * df + 1))
    # tf=1, dl=avgdl -> tf factor = (k1+1) / (1 + k1) = 1.0 exactly
    assert out[0]["score"] == idf_exact
    true_idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    assert abs(idf_exact - true_idf) <= math.log(1 + 1.0 / BM25_LN_BUCKETS)


def test_bm25_log_vs_raw_order_differs(spark):
    """The r9-documented fidelity gap, demonstrated: raw IDF over-weights
    rare terms relative to log IDF, so the same multi-term query orders
    the same corpus DIFFERENTLY — exactly the surface where raw BM25
    diverges from what a Lucene/ES user expects. (This is why log is
    the default.)"""
    filler = " ".join(f"f{j}" for j in range(39))
    rows = [(1, "rare " + filler)]          # one rare hit, LONG doc
    rows.append((2, "common " * 5))          # five common hits, short doc
    rows += [(i, "common pad here") for i in range(3, 53)]   # df(common)=51
    rows += [(i, "pad only here") for i in range(53, 102)]   # N=101
    df = _docs(spark, rows)

    top_log = [r["doc_id"] for r in
               bm25_topk(df, ("rare", "common"), top_k=2, idf="log").collect()]
    top_raw = [r["doc_id"] for r in
               bm25_topk(df, ("rare", "common"), top_k=2, idf="raw").collect()]
    assert set(top_log) == set(top_raw) == {1, 2}
    assert top_raw[0] == 1  # raw: the rare hit dominates despite length
    assert top_log[0] == 2  # log: the strong common match wins
    assert top_log != top_raw

    with pytest.raises(ValueError, match="idf"):
        bm25_topk(df, ("rare",), idf="nope")


def test_bm25_log_plan_still_single_broadcast(spark):
    """The quantized tables ride the plan as constant arrays — no new
    exchange, no Python, top-k still a per-partition heap."""
    df = _docs(spark, [(i, f"w{i} spark") for i in range(1, 40)])
    plan = (
        bm25_topk(df, ("spark",), top_k=5, idf="log")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
