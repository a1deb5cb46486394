"""Validation-gated publishing (S11).

The reference validates run artifacts before they reach the published archive
— structural checks, PII scrubbing, non-finite numeric rejection
(/root/reference/src/batch_doc_vqa/benchmarks/published_runs.py:759-833).
Engine form: a pure column-expression classifier tags every row with a reject
reason (or null = publishable); ``publish_run`` splits the frame, appends only
clean rows to the published table, and quarantines the rest with their reason
so nothing is silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# conservative PII pattern: emails (the reference's scrub list also covers
# names/ids, which here are structural columns, not free text)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def publish_reject_reason(
    text_col: str | None = None,
    numeric_cols: tuple[str, ...] = (),
    json_cols: tuple[str, ...] = (),
):
    """Column expr: first failed validation rule, or NULL if publishable.

    Rule order (first match wins, mirroring the reference's short-circuit
    validation): empty text → PII → non-finite numerics → unparseable JSON.
    """
    checks = []
    if text_col is not None:
        t = F.col(text_col)
        checks.append((t.isNull() | (F.trim(t) == ""), "empty"))
        checks.append((t.rlike(PII_EMAIL_RE), "pii_email"))
    for c in numeric_cols:
        col = F.col(c)
        checks.append((col.isNotNull() & (F.isnan(col) | (F.abs(col) == float("inf"))), "non_finite"))
    for c in json_cols:
        col = F.col(c)
        checks.append((col.isNotNull() & F.get_json_object(col, "$").isNull(), "bad_json"))
    reason = F.lit(None).cast("string")
    for cond, label in reversed(checks):
        reason = F.when(cond, F.lit(label)).otherwise(reason)
    return reason


def publish_run(
    spark: SparkSession,
    results: DataFrame,
    out_dir: str,
    text_col: str | None = "text",
    numeric_cols: tuple[str, ...] = (),
    json_cols: tuple[str, ...] = (),
) -> dict:
    """Gate → split → append. Returns {'published': n, 'quarantined': n}."""
    tagged = results.withColumn(
        "_reject", publish_reject_reason(text_col, numeric_cols, json_cols)
    )
    tagged.filter(F.col("_reject").isNull()).drop("_reject").write.mode("append").parquet(
        f"{out_dir}/published"
    )
    quarantined = tagged.filter(F.col("_reject").isNotNull()).withColumnRenamed(
        "_reject", "reject_reason"
    )
    quarantined.write.mode("append").parquet(f"{out_dir}/quarantine")
    pub = spark.read.parquet(f"{out_dir}/published").count()
    quar = spark.read.parquet(f"{out_dir}/quarantine").count()
    return {"published": pub, "quarantined": quar}
