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
