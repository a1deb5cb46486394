"""Idempotent enrichment pass: backfill missing costs into results.

Spark shape of the reference's post-hoc cost backfill
(/root/reference/src/batch_doc_vqa/openrouter/api.py:501-677): only rows with
a generation id and no cost are candidates (:505-515 — the J7 anti-pattern),
the fetched costs merge in keyed by generation id, and reruns are no-ops.
With parquet (no MERGE INTO) the idempotent form is a pure-function snapshot
rewrite: coalesce(existing cost, new cost) — running it twice with the same
cost source yields a byte-identical table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
