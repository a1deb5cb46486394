"""Validation-gated publishing (S11) with an atomic per-run commit.

The reference validates run artifacts before they reach the published archive
— structural checks, PII scrubbing, non-finite numeric rejection
(/root/reference/src/batch_doc_vqa/benchmarks/published_runs.py:759-833) —
and gates archive visibility behind a manifest write
(published_runs.py:884-911). Engine form: a pure column-expression classifier
tags every row with a reject reason (or null = publishable); ``publish_run``
splits the frame into run-scoped ``published/run_id=…`` and
``quarantine/run_id=…`` directories and then — only after BOTH halves have
fully landed — creates a single ``_committed/<run_id>`` marker file. The
readers (``read_published`` / ``read_quarantine``) filter on the marker set,
so a crash between the two writes can never surface a torn run: the
half-written directories exist on disk but are invisible until the marker
appears, and a retry of the same run_id overwrites them idempotently. This
is the parquet emulation of an Iceberg two-table transaction; the marker
file plays the snapshot-commit role.
"""

from __future__ import annotations

import uuid

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


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def committed_publish_ids(spark: SparkSession, out_dir: str) -> list[str]:
    """run_ids whose publish transaction fully committed (marker exists)."""
    fs, jpath = _fs(spark, f"{out_dir}/_committed")
    if not fs.exists(jpath):
        return []
    return sorted(s.getPath().getName() for s in fs.listStatus(jpath))


def commit_marker(spark: SparkSession, out_dir: str, run_id: str) -> None:
    """The single atomic file-create that makes a run visible — ONE
    definition shared by every marker-committed sink (batch publish,
    streaming publish epochs, streaming decontamination verdicts)."""
    fs, marker = _fs(spark, f"{out_dir}/_committed/{run_id}")
    fs.mkdirs(marker.getParent())
    fs.create(marker, True).close()


def read_committed_table(spark: SparkSession, out_dir: str, table: str) -> DataFrame:
    """Committed-runs-only view of a marker-committed table.

    Raises FileNotFoundError with a clear message when NO run has ever
    committed (a half-written first run leaves table dirs you must not
    read — "nothing committed yet" is the only safe answer; a raw
    PATH_NOT_FOUND from the torn half would be misleading). The isin
    literal list grows with run count — fine to ~10^4 runs; past that,
    compact old runs into a consolidated partition (the Iceberg analogue
    is snapshot expiration) so the live marker set stays small.
    """
    ids = committed_publish_ids(spark, out_dir)
    if not ids:
        raise FileNotFoundError(
            f"no committed runs under {out_dir} (the _committed marker set is "
            "empty — a torn first run is invisible by design)"
        )
    # mergeSchema: runs may carry optional audit columns (scrub_pii adds
    # n_redactions) — without the merge, which columns surface would depend
    # on which run's file the schema got sampled from
    df = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/{table}")
    # partition filter on the committed id set: torn (marker-less) run dirs
    # are pruned at the directory level, never scanned
    return df.filter(F.col("run_id").isin(ids))


_read_committed = read_committed_table


def read_published(spark: SparkSession, out_dir: str) -> DataFrame:
    """The published archive — committed runs only (never a torn run)."""
    return _read_committed(spark, out_dir, "published")


def read_quarantine(spark: SparkSession, out_dir: str) -> DataFrame:
    """The quarantine table — committed runs only (never a torn run)."""
    return _read_committed(spark, out_dir, "quarantine")


def publish_run(
    spark: SparkSession,
    results: DataFrame,
    out_dir: str,
    text_col: str | None = "text",
    numeric_cols: tuple[str, ...] = (),
    json_cols: tuple[str, ...] = (),
    decode_status_col: str | None = None,
    run_id: str | None = None,
    scrub_pii: bool = False,
    _crash_before_commit: str | None = None,
) -> dict:
    """Gate → split → staged run-scoped writes → atomic marker commit.

    Returns THIS RUN's {'published': n, 'quarantined': n, 'run_id': id}.

    ``scrub_pii=True`` selects the reference's archive semantics — PII is
    SCRUBBED, not dropped (published_runs.py:759-833 rewrites identifiers
    before the row reaches the archive): ``text_col`` runs through the
    ``operators/pii`` redaction cascade BEFORE the gate classifier, so a
    row whose only problem was PII publishes with typed placeholders (and
    an ``n_redactions`` audit column); the quarantine keeps catching
    everything else. Default False = detect-and-quarantine.

    Counts come from one tiny aggregate over the tagged frame *before* the
    writes — not a read-back of the cumulative tables (which would cost two
    extra full scans per publish at scale and report prior runs' rows as this
    run's). The tagged frame is localCheckpointed so the gate classifier runs
    once, and count + both writes reuse the same materialization.

    Atomicity: both halves land in ``<table>/run_id=<id>`` directories
    (mode=overwrite, so a retried run_id is idempotent); the run becomes
    visible to ``read_published``/``read_quarantine`` only when the single
    ``_committed/<id>`` marker file is created after both writes succeed.
    ``_crash_before_commit`` is a test-only fault-injection point: 'published'
    raises after the published half, 'quarantine' after both halves but
    before the marker — the kill-between-writes test drives both.
    """
    run_id = run_id or "p" + uuid.uuid4().hex[:12]
    if scrub_pii and text_col is not None:
        from ..operators.pii import redact_columns

        col, total = redact_columns(text_col)
        results = results.withColumn("n_redactions", total).withColumn(text_col, col)
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
    write_tagged_run(spark, tagged, out_dir, run_id, _crash_before_commit)
    return {
        "published": counts.get(True, 0),
        "quarantined": counts.get(False, 0),
        "run_id": run_id,
    }


def write_tagged_run(
    spark: SparkSession,
    tagged: DataFrame,
    out_dir: str,
    run_id: str,
    _crash_before_commit: str | None = None,
    skip_if_committed: bool = False,
) -> bool:
    """The staged-write + marker-commit protocol, shared by the batch
    publisher and the streaming twin (one definition — the two sinks cannot
    drift). ``tagged`` carries a ``_reject`` column; both halves land in
    run-scoped directories (overwrite = idempotent replay) and become
    visible only when the single marker file is created.

    ``skip_if_committed=True`` (the streaming epochs): a run_id whose marker
    already exists is left untouched and False is returned. For a true
    replay (crash after marker, before the stream checkpoint advanced) the
    content is identical, so skipping is exact; for a LOST-checkpoint
    restart (epoch numbering resets over an existing archive) it prevents
    the new batch 0 from destroying the committed old epoch 0 — that
    operator mistake needs a fresh out_dir, not a silent overwrite."""
    if skip_if_committed:
        fs, marker = _fs(spark, f"{out_dir}/_committed/{run_id}")
        if fs.exists(marker):
            return False
    tagged.filter(F.col("_reject").isNull()).drop("_reject").write.mode("overwrite").parquet(
        f"{out_dir}/published/run_id={run_id}"
    )
    if _crash_before_commit == "published":
        raise RuntimeError("fault injection: crashed after published half")
    tagged.filter(F.col("_reject").isNotNull()).withColumnRenamed(
        "_reject", "reject_reason"
    ).write.mode("overwrite").parquet(f"{out_dir}/quarantine/run_id={run_id}")
    if _crash_before_commit == "quarantine":
        raise RuntimeError("fault injection: crashed before commit marker")
    commit_marker(spark, out_dir, run_id)  # single atomic create = the commit point
    return True
