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
    """A store written under a different format (pre-r7 hex band keys,
    or the r7-r12 flat batch_id=N layout a format-3 reader would see
    NONE of) must be refused at construction with a clear error —
    silently reading past it would let every seen document back in."""
    import json
    import os

    import pytest

    from weather_monitoring_spark.streaming.doc_dedup import STORE_FORMAT

    store = str(tmp_path / "store")
    os.makedirs(store)
    for old_fmt in (1, 2):
        with open(os.path.join(store, "meta.json"), "w") as f:
            json.dump({"last_batch_id": 3, "format": old_fmt}, f)
        with pytest.raises(ValueError, match=f"format {old_fmt}"):
            StreamingDocDedup(spark, store)
    # current-format store constructs fine
    with open(os.path.join(store, "meta.json"), "w") as f:
        json.dump({"last_batch_id": 3, "format": STORE_FORMAT}, f)
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

    # Simulate a crash during batch 1: stores written, fp delta lost,
    # meta never committed.
    b1 = _docs(spark, [(3, _varied("gamma")), (4, _varied("delta"))])
    dd.process_batch(b1, 1)
    os.remove(dd._meta)
    shutil.rmtree(dd._delta_dir(dd.fp_dir, 1))

    # Replay overwrites batch 1's delta dirs -> consistent state.
    dd.process_batch(b1, 1)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [1, 2, 3, 4]
    fp = dd._read_store(dd.fp_dir, 1 << 62)
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


def test_dedup_across_compaction_boundary(spark, tmp_path):
    """Exact and fuzzy dedup must keep firing after deltas fold into a
    base generation, and the folded deltas/old generations must be
    swept: the r12 layout kept one directory per micro-batch forever
    (8,640/day at a 10 s trigger)."""
    import os

    dd = StreamingDocDedup(spark, str(tmp_path / "store"), compact_every=2)
    texts = {i: _varied(f"t{i}") for i in range(6)}
    dd.process_batch(_docs(spark, [(0, texts[0]), (1, texts[1])]), 0)
    dd.process_batch(_docs(spark, [(2, texts[2])]), 1)  # compacts at 1
    assert dd._base_through() == 1
    # exact dup of a COMPACTED doc + near-dup of a COMPACTED doc
    near0 = texts[0].replace("t00", "sleepy", 1)
    dd.process_batch(_docs(spark, [(3, texts[1]), (4, near0), (5, texts[3])]), 2)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [0, 1, 2, 5]
    dd.process_batch(_docs(spark, [(6, texts[4])]), 3)  # compacts at 3
    assert dd._base_through() == 3
    # folded deltas swept; on-disk runs == exactly the meta's live list
    live = {f"gen={r['gen']}" for r in dd._runs()}
    for root in (dd.corpus_dir, dd.fp_dir, dd.bands_dir):
        assert set(os.listdir(os.path.join(root, "base"))) == live
        assert os.listdir(os.path.join(root, "delta")) == []
    # dedup still fires against the new generation
    dd.process_batch(_docs(spark, [(7, texts[4]), (8, texts[5])]), 4)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [0, 1, 2, 5, 6, 8]


def test_crash_replay_across_compaction_boundary(spark, tmp_path):
    """Crash AFTER the compaction write but BEFORE the meta flip: the
    old view stays authoritative (the half-adopted generation is
    unreachable), and the replay overwrites it deterministically."""
    import os
    import shutil

    store = tmp_path / "store"
    dd = StreamingDocDedup(spark, str(store), compact_every=2)
    dd.process_batch(_docs(spark, [(0, _varied("a")), (1, _varied("b"))]), 0)

    b1 = _docs(spark, [(2, _varied("c")), (3, _varied("a"))])  # 3 = exact dup
    # crash window between _compact and the meta flip: the generation is
    # (half-)written, the meta still shows the pre-batch state, and the
    # post-flip sweep never ran — deltas are all still on disk. Simulate
    # by suppressing the sweep, rewinding the meta, damaging the gen.
    real_sweep = dd._sweep
    dd._sweep = lambda *a: None
    dd.process_batch(b1, 1)  # compacted at 1, meta flipped, sweep skipped
    dd._sweep = real_sweep
    with open(dd._meta, "w") as f:
        import json

        json.dump({"last_batch_id": 0, "base_through": -1, "format": 3}, f)
    shutil.rmtree(dd._gen_dir(dd.fp_dir, 1))

    dd.process_batch(b1, 1)  # replay: re-compacts gen=1, re-flips + sweeps
    assert dd._base_through() == 1
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [0, 1, 2]
    # a dup of every survivor is still recognized post-replay
    dd.process_batch(
        _docs(spark, [(4, _varied("a")), (5, _varied("c")), (6, _varied("z"))]), 2
    )
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [0, 1, 2, 6]


def test_store_probe_joins_never_shuffle_the_store(spark, tmp_path):
    """The scale contract the r13 layout exists for: membership checks
    scan the store in place against broadcast batch keys — ZERO shuffle
    Exchanges on the store leg, at any corpus size. (The old sort-merge
    anti join re-exchanged the whole store every trigger.)"""
    dd = StreamingDocDedup(spark, str(tmp_path / "store"))
    dd.process_batch(_docs(spark, [(0, _varied("a")), (1, _varied("b"))]), 0)

    batch = _docs(spark, [(2, _varied("c"))]).withColumn(
        "fp", F.md5(F.col("text"))
    )
    store_fp = dd._read_store(dd.fp_dir, 1)
    plan = (
        dd._drop_seen(batch, store_fp, ["fp"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan


def test_size_tiered_merge_bounds_run_count(spark, tmp_path):
    """Size-tiering: with max_runs=2 and compact_every=1 every batch
    seals a run and the two smallest merge — run count stays <= 2, the
    swept directories match the meta's live list exactly, no document
    is lost across merges, and dedup still fires against merged runs."""
    import os

    dd = StreamingDocDedup(
        spark, str(tmp_path / "store"), compact_every=1, max_runs=2
    )
    texts = {i: _varied(f"m{i}") for i in range(8)}
    for b in range(6):
        dd.process_batch(_docs(spark, [(b, texts[b])]), b)
        assert len(dd._runs()) <= 2
        live = {f"gen={r['gen']}" for r in dd._runs()}
        for root in (dd.corpus_dir, dd.fp_dir, dd.bands_dir):
            assert set(os.listdir(os.path.join(root, "base"))) == live
    # run row counts account for every survivor
    assert sum(r["rows"] for r in dd._runs()) == 6
    # exact + fuzzy dedup against content now living in merged runs
    near2 = texts[2].replace("m20", "sleepy", 1)
    dd.process_batch(_docs(spark, [(10, texts[0]), (11, near2), (12, texts[6])]), 6)
    assert sorted(r.doc_id for r in dd.corpus().collect()) == [0, 1, 2, 3, 4, 5, 12]
