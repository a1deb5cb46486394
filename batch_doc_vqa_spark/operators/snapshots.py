"""Snapshot diff: dataset versioning between two corpus states.

A training-data pipeline re-crawls; before re-running the expensive stages
it needs to know WHAT changed — which documents appeared, vanished, or
changed content — both to scope incremental work (only added/changed rows
re-enter extraction/dedup) and to audit a dataset release ("v2 = v1 plus
12M docs, minus 3M, 0.4% rewritten"). This is the table-diff the reference
performs implicitly by re-scanning run directories and comparing result
files (core/run_manager.py run-scoped artifacts); here it is one plan.

Shape: full outer join on the id, change detection by content hash (md5 —
never by timestamp, which re-serialization perturbs). One shuffle on the
id key per side; the summary is a map-side-combined count. The hash
comparison makes the diff safe for re-encoded but byte-identical corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, change) rows: change ∈ added | removed | changed | unchanged.

    Presence comes from explicit per-side indicator columns, never from
    hash nullness — a NULL-text row (a re-crawl whose extraction failed)
    must classify by its id's presence, with NULL-safe hash comparison, or
    it would masquerade as added/removed and dodge the work set."""
    o = old.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_old_h"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_new_h"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, "_id", "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_old_h").eqNullSafe(F.col("_new_h")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col("_id").alias(id_col), change.alias("change"))


def snapshot_diff_summary(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """One row per change kind with counts — the release audit line."""
    return (
        snapshot_diff(old, new, id_col, text_col)
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def incremental_work_set(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The rows downstream stages must reprocess: added + changed docs, with
    their NEW content — the scoping step before an incremental pipeline run
    (pairs with the resume anti-join and the incremental dedup index)."""
    diff = snapshot_diff(old, new, id_col, text_col).filter(
        F.col("change").isin("added", "changed")
    )
    return new.join(diff.select(id_col), id_col)
