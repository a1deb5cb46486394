"""Key-resolution joins and doc-level merges.

- ``resolve_key_cascade`` (J3): the reference looks results up by exact path,
  then POSIX/resolved variants, then unique basename — ambiguous basenames
  resolve to nothing (/root/reference/src/batch_doc_vqa/utils/
  string_matching.py:177-211, duplicated in ta_benchmark/io_utils.py:82-117).
  Spark-first: normalize keys *before* joining, left-join on the exact key,
  then fall back to a basename join filtered to unique basenames (the
  ambiguity rule becomes a groupBy-having, not a per-row dict probe).
- ``merge_page_entries`` (U5): doc-level merge of per-page entries,
  first-nonempty-page wins per (doc, uid)
  (/root/reference/src/batch_doc_vqa/ta_benchmark/score_runs.py:39-98) —
  one window, no grouped Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def basename(col):
    return F.regexp_extract(col, r"([^/]+)$", 1)


def resolve_key_cascade(
    rows: DataFrame,
    lookup: DataFrame,
    key: str,
    lookup_key: str,
    value_cols: list[str],
) -> DataFrame:
    """Attach ``value_cols`` from ``lookup`` to ``rows``: exact key match
    first, else unique-basename match, else NULLs + resolution tag."""
    lk = lookup.select(F.col(lookup_key).alias("_lk"), *value_cols)

    exact = rows.join(lk, rows[key] == F.col("_lk"), "left").drop("_lk")
    exact = exact.withColumn(
        "_resolved", F.when(F.col(value_cols[0]).isNotNull(), F.lit("exact"))
    )

    # unique-basename side table: ambiguous basenames are dropped (count > 1 ⇒ null)
    base_lk = (
        lk.groupBy(basename(F.col("_lk")).alias("_bn"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.first(c).alias(f"_bn_{c}") for c in value_cols],
        )
        .filter(F.col("_n") == 1)
        .drop("_n")
    )
    out = exact.join(F.broadcast(base_lk), basename(exact[key]) == F.col("_bn"), "left")
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_bn_{c}"))).drop(f"_bn_{c}")
    return out.withColumn(
        "resolution",
        F.coalesce(
            F.col("_resolved"),
            F.when(F.col(value_cols[0]).isNotNull(), F.lit("basename")),
            F.lit("unmatched"),
        ),
    ).drop("_bn", "_resolved")


def merge_page_entries(
    entries: DataFrame,
    doc_col: str = "doc",
    uid_col: str = "uid",
    page_col: str = "page",
    value_col: str = "value",
) -> DataFrame:
    """First non-empty value per (doc, uid) across pages in page order (U5/W6)."""
    nonempty = entries.filter(F.col(value_col).isNotNull() & (F.col(value_col) != ""))
    w = Window.partitionBy(doc_col, uid_col).orderBy(page_col)
    return (
        nonempty.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(doc_col, uid_col, page_col, value_col)
    )


def rewrite_legacy_aliases(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Legacy → canonical column rewrite (P3; reference presets/student.py:52-53
    renames ufid → university_id). If both columns exist the canonical value
    wins per row (coalesce) — mixed-era tables merge losslessly; a legacy-only
    column is renamed outright.
    """
    for legacy, canonical in mapping.items():
        if legacy in df.columns and canonical in df.columns:
            df = df.withColumn(canonical, F.coalesce(F.col(canonical), F.col(legacy))).drop(legacy)
        elif legacy in df.columns:
            df = df.withColumnRenamed(legacy, canonical)
    return df
