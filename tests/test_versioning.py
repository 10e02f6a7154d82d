"""Unit tests for operators/versioning.py — snapshot diff verdicts,
summary conservation, and the incremental changed-slice. (Cross-engine
oracle parity runs in test_oracle_parity via the x_snapshot_diff extra.)"""

from __future__ import annotations

from weather_monitoring_spark.operators.versioning import (
    changed_slice,
    diff_summary,
    snapshot_diff,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_snapshot_diff_all_four_verdicts(spark):
    old = _snap(spark, [(1, "same"), (2, "before"), (3, "gone")])
    new = _snap(spark, [(1, "same"), (2, "after"), (4, "fresh")])
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_diff_summary_conserves_id_universe(spark):
    old = _snap(spark, [(i, f"t{i}") for i in range(100)])
    new = _snap(spark, [(i, f"t{i}" if i % 4 else "edited") for i in range(20, 120)])
    diff = snapshot_diff(old, new)
    counts = {r["status"]: r["n"] for r in diff_summary(diff).collect()}
    # universe = 0..119; removed 0..19, added 100..119
    assert counts["removed"] == 20 and counts["added"] == 20
    assert sum(counts.values()) == 120
    assert diff.count() == 120


def test_changed_slice_is_added_plus_changed_rows(spark):
    old = _snap(spark, [(1, "a"), (2, "b")])
    new = _snap(spark, [(1, "a"), (2, "B"), (3, "c")])
    diff = snapshot_diff(old, new)
    got = sorted(r["doc_id"] for r in changed_slice(new, diff).collect())
    assert got == [2, 3]


def test_dup_source_matrix_known_frame(spark):
    from weather_monitoring_spark.operators.dedup import dup_source_matrix

    docs = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "books"), (4, "code")],
        "doc_id bigint, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 1), (2, 4)], "id_a bigint, id_b bigint"
    )
    out = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in dup_source_matrix(docs, pairs).collect()
    }
    # (1,3) and (3,1) both normalize to (books, web)
    assert out == {("web", "web"): 1, ("books", "web"): 2, ("code", "web"): 1}


def test_snapshot_diff_null_text_is_presence_not_absence(spark):
    """Digest nullity is snapshot_diff's row-presence flag, so NULL text
    must digest to a per-id sentinel: a doc present in both snapshots
    with NULL text on one side is 'changed'/'unchanged', never
    'added'/'removed' (the r12 null-identity class)."""
    old = spark.createDataFrame(
        [(1, None), (2, "was text"), (3, None), (5, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, "now text"), (4, None)],
        "doc_id long, text string",
    )
    by = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert by == {
        1: "unchanged",  # null -> null: same id, no evidence of change
        2: "changed",    # text -> null
        3: "changed",    # null -> text
        4: "added",      # truly absent from old (null text irrelevant)
        5: "removed",    # truly absent from new
    }
