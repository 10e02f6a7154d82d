"""Streaming document dedup: exact + fuzzy filtering against everything
seen so far, across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_monitoring_spark.streaming.doc_dedup import StreamingDocDedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _varied(prefix: str, n: int = 60) -> str:
    # distinct words -> many distinct shingles -> LSH behaves like it does
    # on real prose (repetitive strings collapse to a handful of shingles)
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_store_format_version_refusal(spark, tmp_path):
    """A store written under a different band-key format (pre-r7 hex
    strings vs r7 60-bit BIGINTs) must be refused at construction with
    a clear error — a type-coerced join against mixed stores would
    silently match nothing and let near-dups back in."""
    import json
    import os

    import pytest

    store = str(tmp_path / "store")
    os.makedirs(store)
    with open(os.path.join(store, "meta.json"), "w") as f:
        json.dump({"last_batch_id": 3, "format": 1}, f)
    with pytest.raises(ValueError, match="format 1"):
        StreamingDocDedup(spark, store)
    # current-format store constructs fine
    with open(os.path.join(store, "meta.json"), "w") as f:
        json.dump({"last_batch_id": 3, "format": 2}, f)
    StreamingDocDedup(spark, store)


def test_streaming_dedup_exact_and_fuzzy(spark, tmp_path):
    dd = StreamingDocDedup(spark, str(tmp_path / "store"))
    base = _varied("alpha")

    # batch 0: two identical texts (exact dup) + one distinct
    b0 = _docs(spark, [(1, base), (2, base), (3, _varied("beta"))])
    dd.process_batch(b0, 0)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 3]

    # batch 1: exact dup of corpus (4), near-dup of corpus (5: one word
    # changed -> jaccard ~0.95), and a genuinely new doc (6)
    near = base.replace("alpha30", "sleepy", 1)
    b1 = _docs(spark, [(4, base), (5, near), (6, _varied("gamma"))])
    dd.process_batch(b1, 1)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 3, 6]

    # replay batch 1 (at-least-once) -> no change
    dd.process_batch(b1, 1)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 3, 6]

    # batch 2: near-dup of doc 6 is dropped; unrelated survives
    b2 = _docs(
        spark,
        [(7, _varied("gamma").replace("gamma7", "tail", 1)), (8, _varied("delta"))],
    )
    dd.process_batch(b2, 2)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 3, 6, 8]


def test_streaming_dedup_batch_internal_fuzzy(spark, tmp_path):
    """Two near-dup (but not byte-identical) documents arriving in the
    SAME micro-batch: only the min-id one survives."""
    dd = StreamingDocDedup(spark, str(tmp_path / "store"))
    base = _varied("alpha")
    near = base.replace("alpha30", "sleepy", 1)
    b0 = _docs(spark, [(1, base), (2, near), (3, _varied("beta"))])
    dd.process_batch(b0, 0)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 3]


def test_streaming_dedup_partial_batch_replay_reconciles(spark, tmp_path):
    """Crash-consistency: a batch whose stores were only partially written
    (crash before the meta commit — here even with the fp partition
    missing entirely) must replay to the SAME final state, with no
    duplicate corpus rows and consistent fp/band indexes."""
    import os
    import shutil

    store = tmp_path / "store"
    dd = StreamingDocDedup(spark, str(store))
    b0 = _docs(spark, [(1, _varied("alpha")), (2, _varied("beta"))])
    dd.process_batch(b0, 0)

    # Simulate a crash during batch 1: stores written, fp partition lost,
    # meta never committed.
    b1 = _docs(spark, [(3, _varied("gamma")), (4, _varied("delta"))])
    dd.process_batch(b1, 1)
    os.remove(dd._meta)
    shutil.rmtree(os.path.join(dd.fp_dir, "batch_id=1"))

    # Replay overwrites batch 1's partitions -> consistent state.
    dd.process_batch(b1, 1)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 2, 3, 4]
    fp = spark.read.parquet(dd.fp_dir)
    assert fp.count() == fp.select("fp").distinct().count() == 4

    # An exact dup of a batch-1 doc is still recognized afterwards.
    b2 = _docs(spark, [(5, _varied("gamma")), (6, _varied("eps"))])
    dd.process_batch(b2, 2)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 2, 3, 4, 6]


def test_streaming_dedup_null_text_docs_are_not_collapsed(spark, tmp_path):
    """NULL text means UNKNOWN content (e.g. a reject-routed or damaged
    record whose payload was lost): such docs must neither dedup against
    EACH OTHER (md5(NULL) pooled them — and the null-rejecting semi join
    then dropped every one of them) nor enter the fuzzy stage (they all
    minhash to the same degenerate signature). Re-arrival of the SAME
    doc_id still dedups via its sentinel fingerprint."""
    dd = StreamingDocDedup(spark, str(tmp_path / "store"))

    b0 = _docs(
        spark,
        [(1, None), (2, None), (3, _varied("beta")), (4, None)],
    )
    dd.process_batch(b0, 0)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 2, 3, 4]

    # same null doc_id re-arrives (at-least-once source): store dedup
    # fires on the sentinel; a NEW null-text doc id still survives
    b1 = _docs(spark, [(2, None), (5, None), (6, _varied("gamma"))])
    dd.process_batch(b1, 1)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 2, 3, 4, 5, 6]
