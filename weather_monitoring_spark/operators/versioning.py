"""Corpus snapshot versioning: diff two snapshots of a document table by
content digest.

A recurring need in an iterated training-data pipeline: run N+1 of the
crawl/curation produces a new corpus snapshot, and the pipeline needs the
delta — which documents appeared, vanished, or changed — both to audit
the run and to reprocess only the changed slice (incremental dedup /
re-embedding instead of a full recompute).

Scale shape: each side collapses to (id, md5 digest) before the join —
16-byte digests, never document text — so the full-outer equi-join on the
id shuffles O(ids), not O(bytes). The digest is md5 (the engine's one
cross-engine hash), making the whole diff DuckDB-oracle-checkable.

Reference parity: the reference archives immutably and never diffs
(``ParquetArchiver.java`` append-only); this extends the engine per the
builder brief's LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-id diff verdict between two corpus snapshots. Returns
    (id, status, old_digest, new_digest) with status one of
    'added' | 'removed' | 'changed' | 'unchanged'.

    Both sides reduce to (id, digest) projections before a full outer
    join on the id; text never crosses the shuffle.

    NULL text digests to a per-id ``null:<id>`` sentinel, NOT NULL:
    digest nullity is this function's row-presence flag, so a doc
    present in both snapshots with NULL text on one side was
    misclassified as added/removed (the r12 null-identity class). With
    the sentinel, null -> null reads 'unchanged' (same id, no evidence
    of change) and null -> text reads 'changed'."""
    def dig(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.coalesce(
                F.md5(F.col(text_col)),
                F.concat(F.lit("null:"), F.col(id_col).cast("string")),
            ).alias(alias),
        )

    o = dig(old, "old_digest")
    n = dig(new, "new_digest")
    return (
        o.join(n, "_id", "full_outer")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("old_digest").isNull(), F.lit("added"))
            .when(F.col("new_digest").isNull(), F.lit("removed"))
            .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
            "old_digest",
            "new_digest",
        )
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Roll a snapshot_diff up to (status, n) — the run-audit artifact."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).cast("long").alias("n"))


def changed_slice(new: DataFrame, diff: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The incremental-reprocessing input: new-snapshot rows whose content
    is new or changed (a left-semi join — the diff side carries only ids,
    broadcastable when the delta is small, which is the point)."""
    delta = diff.filter(F.col("status").isin("added", "changed")).select(id_col)
    return new.join(delta, id_col, "left_semi")
