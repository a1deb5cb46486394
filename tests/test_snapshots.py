"""Snapshot diff / incremental work-set: dataset versioning semantics."""

from __future__ import annotations

from batch_doc_vqa_spark.operators.snapshots import (
    incremental_work_set,
    snapshot_diff,
    snapshot_diff_summary,
)


def _pair(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta CHANGED"), (4, "delta"), (9, "brand new")],
        "doc_id long, text string",
    )
    return old, new


def test_diff_classification(spark):
    old, new = _pair(spark)
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "unchanged", 9: "added"}
    summary = {r["change"]: r["n"]
               for r in snapshot_diff_summary(old, new, "doc_id", "text").collect()}
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_work_set_is_added_plus_changed_new_content(spark):
    old, new = _pair(spark)
    got = {r["doc_id"]: r["text"]
           for r in incremental_work_set(old, new, "doc_id", "text").collect()}
    assert got == {2: "beta CHANGED", 9: "brand new"}


def test_diff_ignores_reserialization(spark):
    """Identical content = unchanged even if the row was physically
    rewritten — the hash comparison, never a timestamp."""
    old, _ = _pair(spark)
    rewritten = old.repartition(3)  # different physical layout, same bytes
    got = set(r["change"] for r in snapshot_diff(old, rewritten, "doc_id", "text").collect())
    assert got == {"unchanged"}
