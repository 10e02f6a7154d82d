"""Semantic tests for winnowing fingerprints (operators/winnow.py):
independent Python reference, the winnowing window guarantee, and the
shared-run matching guarantee. Corpus-scale oracle parity is covered by
x_winnow_fingerprints / x_winnow_matches in plans/extra_checks.py."""

from __future__ import annotations

import hashlib
import re

import pytest

from weather_monitoring_spark.operators.winnow import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_matches,
)


def _py_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set[tuple[int, int]]:
    """Reference winnowing: rightmost-min per window, 1-based positions."""
    tk = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if len(tk) < k + w - 1:
        return set()
    gh = [
        int(hashlib.md5(f"wn:{' '.join(tk[i : i + k])}".encode()).hexdigest()[:8], 16)
        for i in range(len(tk) - k + 1)
    ]
    out = set()
    for j in range(len(gh) - w + 1):
        win = gh[j : j + w]
        m = min(win)
        # rightmost occurrence of the min in the window
        off = w - 1 - win[::-1].index(m)
        out.add((j + off + 1, m))  # 1-based global gram position
    return out


SHARED = "q1 q2 q3 q4 q5 q6 q7"  # k+w-1 = 7 tokens: the guarantee threshold

DOCS = [
    (1, "apple river stone cloud metal forest garden window candle bridge"),
    (2, f"zebra {SHARED} yellow xylophone"),
    (3, f"violet umbrella trumpet {SHARED}"),
    (4, "tiny doc"),  # below k+w-1: no complete window
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_fingerprints_match_python_reference(docs):
    got = {
        d: {(r.pos, r.fp) for r in rows}
        for d, rows in (
            (doc_id, winnow_fingerprints(docs).filter(f"doc_id = {doc_id}").collect())
            for doc_id, _ in DOCS
        )
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_winnow(text), f"doc {doc_id}"


def test_window_coverage_guarantee(docs):
    """Every window of w consecutive grams contains a selected position."""
    for doc_id, text in DOCS[:3]:
        fps = _py_winnow(text)
        sel = sorted(p for p, _ in fps)
        tk = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        n_grams = len(tk) - WINNOW_K + 1
        for j in range(1, n_grams - WINNOW_W + 2):  # 1-based window starts
            assert any(j <= p <= j + WINNOW_W - 1 for p in sel), (doc_id, j)


def test_shared_run_guarantee_produces_match(docs):
    """Docs 2 and 3 share exactly k+w-1 tokens -> guaranteed >= 1 shared
    fingerprint; with min_shared=1 the pair MUST be reported (no
    probabilistic recall argument — this is winnowing's contract)."""
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_matches(docs, min_shared=1, max_fp_df=None).collect()
    }
    assert (2, 3) in pairs
    # doc 1 shares nothing with anyone
    assert not any(1 in p for p in pairs)


def test_density_below_gram_count(docs):
    """Winnowing selects ~2/(w+1) of grams — far fewer than all of them."""
    fp_n = winnow_fingerprints(docs).filter("doc_id = 1").count()
    tk = len(DOCS[0][1].split())
    n_grams = tk - WINNOW_K + 1
    assert 0 < fp_n < n_grams


def test_winnow_fingerprints_run_in_structured_streaming(tmp_path, spark):
    """Fingerprint selection is a pure per-row projection, so the SAME
    operator runs unchanged as a streaming transformation — the
    fingerprint index of a live crawl is just the streaming write of
    this frame. Stream output must equal the batch run row-for-row."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch_docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    batch_docs.write.parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (
        winnow_fingerprints(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch = {tuple(r) for r in winnow_fingerprints(batch_docs).collect()}
    assert streamed == batch and len(batch) > 0


def test_lm_score_runs_as_stream_static_join(tmp_path, spark):
    """lm_score against a STATIC LM table is a stream-static equi-join +
    streaming aggregation — the live-scoring shape (LM artifact pinned,
    documents streaming). Complete-mode output must equal the batch run."""
    from weather_monitoring_spark.operators.textops import bigram_lm, lm_score

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    batch_docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    batch_docs.write.parquet(src)
    lm = bigram_lm(batch_docs.filter("doc_id % 2 = 0")).localCheckpoint(eager=True)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (
        lm_score(stream, lm)
        .writeStream.format("memory")
        .queryName("lm_scores")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {tuple(r) for r in spark.sql("SELECT * FROM lm_scores").collect()}
    batch = {tuple(r) for r in lm_score(batch_docs, lm).collect()}
    assert streamed == batch and len(batch) > 0


def test_winnow_fingerprints_plan_is_shuffle_free(docs):
    """The scale claim, asserted on the physical plan: fingerprint
    selection is one scan projection — NO Exchange anywhere."""
    plan = winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_winnow_contamination_guarantee(spark):
    """A train doc overlapping an eval doc on exactly w+k-1 tokens MUST
    be flagged; disjoint train docs must not be."""
    from weather_monitoring_spark.operators.winnow import winnow_contamination

    train = spark.createDataFrame(
        [(1, f"t11 t12 {SHARED} t13 t14"),  # contains the eval run
         (2, "clean doc with entirely distinct wording all the way through")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, f"e1 e2 {SHARED} e3")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in winnow_contamination(train, bench).collect()}
    assert set(out) == {1, 2}  # every train doc gets a verdict
    assert out[1].contaminated and out[1].n_hits >= 1
    assert not out[2].contaminated and out[2].n_hits == 0


def test_contamination_spans_localize_planted_overlap(spark):
    """The planted eval run sits at tokens 3..9 of the train doc; the
    reported span must land inside it (edge slack bounded by w)."""
    from weather_monitoring_spark.operators.winnow import (
        WINNOW_K,
        contamination_spans,
    )

    train = spark.createDataFrame(
        [(1, f"t11 t12 {SHARED} t13 t14"),
         (2, "clean doc with entirely distinct wording all the way through")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, f"e1 e2 {SHARED} e3")], ["doc_id", "text"])
    spans = contamination_spans(train, bench).collect()
    assert {r.doc_id for r in spans} == {1}
    (s,) = spans
    # run occupies tokens 3..9; in-run gram starts are 3..6 (k=4)
    assert 3 <= s.span_start <= 6
    assert s.span_start + WINNOW_K - 1 <= s.span_end <= 9
    assert s.n_hits >= 1


def test_incremental_dedup_guarantee_and_index_append(spark):
    """dedup_against_index inherits the winnowing guarantee: a batch doc
    overlapping ANY indexed doc on >= w+k-1 tokens must be flagged when
    it clears min_shared. The index side never shuffles: the batch
    fingerprints arrive via broadcast. Appending an accepted batch's own
    fingerprints makes the next run see it (the daily loop)."""
    from weather_monitoring_spark.operators.winnow import (
        dedup_against_index,
        fingerprint_index,
    )

    corpus = spark.createDataFrame(
        [(1, f"a1 a2 {SHARED} {SHARED} a3"),  # long planted run (2 windows)
         (2, "historic doc with entirely distinct wording throughout here")],
        ["doc_id", "text"],
    )
    idx = fingerprint_index(corpus)

    batch = spark.createDataFrame(
        [(100, f"n1 n2 {SHARED} {SHARED} n3"),  # near-copy of doc 1
         (101, "fresh new content never seen before anywhere at all truly")],
        ["doc_id", "text"],
    )
    verdicts = dedup_against_index(batch, idx, min_shared=1)
    out = {r.doc_id: r for r in verdicts.collect()}
    assert set(out) == {100, 101}  # every batch doc gets a verdict
    assert out[100].is_dup and out[100].n_hits >= 1
    assert not out[101].is_dup and out[101].n_hits == 0

    # index side joins without shuffling: batch fingerprints broadcast
    plan = verdicts._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    # accept the batch -> append its fingerprints -> re-running flags the
    # batch against ITSELF (self-hits), proving tomorrow sees today
    idx2 = idx.unionByName(fingerprint_index(batch))
    again = {r.doc_id: r for r in dedup_against_index(batch, idx2, min_shared=1).collect()}
    assert again[101].is_dup  # now indexed, so it matches itself
