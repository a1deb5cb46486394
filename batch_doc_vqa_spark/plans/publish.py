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
    decode_status_col: str | None = None,
    allowed_decode: tuple[str, ...] = ("ok",),
):
    """Column expr: first failed validation rule, or NULL if publishable.

    Rule order (first match wins, mirroring the reference's short-circuit
    validation): empty text → PII → non-finite numerics → unparseable JSON →
    un-decoded media. ``decode_status_col`` is the strict-mode contract for
    multimodal rows: only fully-decoded metadata (``decode_status='ok'``,
    see operators/multimodal.py) reaches the published archive. Header-only
    probes ('probe', GIF/JPEG) quarantine as ``probe_only`` — distinct from
    ``stub_decode`` so operators can tell "real dims, no pixels" from
    "nothing decoded".
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
    if decode_status_col is not None:
        status = F.col(decode_status_col)
        if "probe" not in allowed_decode:
            checks.append((status == "probe", "probe_only"))
        checks.append((~status.isin(*allowed_decode, "probe"), "stub_decode"))
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
    decode_status_col: str | None = None,
) -> dict:
    """Gate → split → append. Returns THIS RUN's {'published': n, 'quarantined': n}.

    Counts come from one tiny aggregate over the tagged frame *before* the
    writes — not a read-back of the cumulative tables (which would cost two
    extra full scans per publish at scale and report prior runs' rows as this
    run's). The tagged frame is localCheckpointed so the gate classifier runs
    once, and count + both writes reuse the same materialization.
    """
    tagged = results.withColumn(
        "_reject",
        publish_reject_reason(text_col, numeric_cols, json_cols, decode_status_col),
    ).localCheckpoint(eager=True)
    counts = {
        r["_k"]: r["n"]
        for r in tagged.groupBy(F.col("_reject").isNull().alias("_k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tagged.filter(F.col("_reject").isNull()).drop("_reject").write.mode("append").parquet(
        f"{out_dir}/published"
    )
    quarantined = tagged.filter(F.col("_reject").isNotNull()).withColumnRenamed(
        "_reject", "reject_reason"
    )
    quarantined.write.mode("append").parquet(f"{out_dir}/quarantine")
    return {"published": counts.get(True, 0), "quarantined": counts.get(False, 0)}
