"""Idempotent enrichment pass: backfill missing costs into results.

Spark shape of the reference's post-hoc cost backfill
(/root/reference/src/batch_doc_vqa/openrouter/api.py:501-677): only rows with
a generation id and no cost are candidates (:505-515 — the J7 anti-pattern),
the fetched costs merge in keyed by generation id, and reruns are no-ops.

Two tiers:
- ``backfill_costs`` — pure-frame coalesce merge (the snapshot-rewrite form;
  fine for small tables / inside other plans);
- ``backfill_costs_merge`` — the 100 TB form: partition-scoped rewrite of a
  ``partitionBy(bucket)`` parquet table. Only partitions that contain a row
  which will actually receive a cost are rewritten; everything else stays
  byte-identical on disk. This is the file-source equivalent of Iceberg's
      MERGE INTO results r USING costs c
        ON r.generation_id = c.generation_id AND r.actual_cost IS NULL
      WHEN MATCHED THEN UPDATE SET actual_cost = c.actual_cost
  — same touched-file set as Iceberg's copy-on-write MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def missing_cost_candidates(results: DataFrame) -> DataFrame:
    """Rows eligible for backfill: generation id present, cost absent."""
    return results.filter(
        F.col("generation_id").isNotNull() & F.col("actual_cost").isNull()
    )


def backfill_costs(results: DataFrame, costs: DataFrame) -> DataFrame:
    """Merge fetched costs into results by generation_id; idempotent.

    ``costs``: (generation_id, actual_cost). Existing costs win (never
    overwrite), so replaying the same enrichment is a fixed point.
    """
    c = costs.select(
        F.col("generation_id").alias("_gid"), F.col("actual_cost").alias("_new_cost")
    )
    joined = results.join(
        F.broadcast(c), results["generation_id"] == F.col("_gid"), "left"
    )
    return joined.withColumn(
        "actual_cost", F.coalesce(F.col("actual_cost"), F.col("_new_cost"))
    ).drop("_gid", "_new_cost")


def backfill_costs_merge(
    spark: SparkSession, table_dir: str, costs: DataFrame, partition_col: str = "bucket"
) -> dict:
    """MERGE-shaped backfill over a ``partitionBy(partition_col)`` table.

    1. Find partitions holding candidate rows (gid present, cost null) whose
       gid matches an incoming cost — one semi-join, pruned to two columns.
    2. Read ONLY those partitions (partition pruning on the filter), merge.
    3. Dynamic-partition-overwrite just those directories; untouched
       partitions are never read for data nor rewritten.

    Rerunning with the same cost source is a no-op (filled rows are no longer
    candidates → zero partitions rewritten). Returns counts for lineage.
    """
    tbl = spark.read.parquet(table_dir)
    gids = costs.select(F.col("generation_id").alias("_gid")).distinct()
    hit = (
        missing_cost_candidates(tbl)
        .join(F.broadcast(gids), F.col("generation_id") == F.col("_gid"), "left_semi")
        .select(partition_col)
        .distinct()
    )
    buckets = [r[0] for r in hit.collect()]  # ≤ #partitions: tiny
    if not buckets:
        return {"rewritten_partitions": 0, "merged_rows": 0}
    sub = tbl.filter(F.col(partition_col).isin(buckets))
    # localCheckpoint: materialize BEFORE overwriting the directories we just
    # read (file-source parquet refuses a same-path read+overwrite plan)
    merged = backfill_costs(sub, costs).localCheckpoint(eager=True)
    n = merged.count()
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_dir)
    )
    return {"rewritten_partitions": len(buckets), "merged_rows": n}
