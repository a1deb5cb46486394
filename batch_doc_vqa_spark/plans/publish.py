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
    """run_ids whose publish transaction fully committed (marker exists).
    Only FILES count — a stray subdirectory (e.g. a nested rename artifact
    mid-maintenance-crash) must never read as a phantom run id."""
    fs, jpath = _fs(spark, f"{out_dir}/_committed")
    if not fs.exists(jpath):
        return []
    return sorted(s.getPath().getName() for s in fs.listStatus(jpath) if s.isFile())


class MaintenanceInProgressError(RuntimeError):
    """A store-maintenance lease (compaction) is held — a live maintenance
    pass, or a crashed one awaiting its recover_* function."""


class ConcurrentCommitError(RuntimeError):
    """A run committed while a maintenance swap was in flight. The racing
    run is PRESERVED (the maintenance pass rolls back); re-run it."""


def acquire_maintenance_lease(spark: SparkSession, root: str, payload: dict) -> None:
    """Atomic create-if-absent claim of ``{root}/_compact_lease`` — the
    single-writer gate every marker-committed store's maintenance pass uses
    (publish compaction here, index compaction in operators/dedup_index).
    The body records what the pass supersedes, for crash adjudication."""
    import json as _json

    fs, lease = _fs(spark, f"{root}/_compact_lease")
    fs.mkdirs(lease.getParent())
    try:
        out = fs.create(lease, False)  # overwrite=False: atomic claim
    except Exception as exc:
        # Py4J wraps the Java exception; only the ALREADY-exists condition
        # means "lease held" — a permissions/IO fault (including
        # 'does not exist' messages for a missing parent) must surface as
        # itself, not as misleading recovery advice (the same blanket-catch
        # mistake ADVICE r4 flagged on the resume path)
        msg = str(exc).lower()
        if not ("already exist" in msg or "filealreadyexists" in msg):
            raise
        raise MaintenanceInProgressError(
            f"maintenance lease already held at {root}/_compact_lease — another "
            "compaction is running, or a crashed one left state behind "
            "(run the store's recover function first)"
        ) from exc
    out.write(bytearray(_json.dumps(payload).encode()))
    out.close()


def read_maintenance_lease(spark: SparkSession, root: str) -> dict | None:
    import json as _json

    fs, lease = _fs(spark, f"{root}/_compact_lease")
    if not fs.exists(lease):
        return None
    stream = fs.open(lease)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    try:
        return _json.loads(data.decode())
    except Exception:
        # a crash mid-(re)write leaves an empty/torn lease body. The lease
        # FILE existing is what matters: report it as held-with-empty-body
        # so commit/vacuum still refuse and recover can still adjudicate
        # (an unknown distinguished marker simply takes the rollback path)
        # — raising here would brick every protocol entry point instead
        return {}


def release_maintenance_lease(spark: SparkSession, root: str) -> None:
    fs, lease = _fs(spark, f"{root}/_compact_lease")
    fs.delete(lease, False)


def commit_marker(spark: SparkSession, out_dir: str, run_id: str) -> None:
    """The single atomic file-create that makes a run visible — ONE
    definition shared by every marker-committed sink (batch publish,
    streaming publish epochs, streaming decontamination verdicts, dedup
    index snapshots). Refuses while a maintenance lease is held on the same
    store: a marker committed mid-compaction would not be in the rebuilt
    marker set (the remaining probe-to-commit race is caught by the
    compaction's post-swap verification, which rolls back rather than lose
    the run)."""
    if read_maintenance_lease(spark, out_dir) is not None:
        raise MaintenanceInProgressError(
            f"commit blocked: store maintenance in progress at {out_dir} "
            "(lease held) — retry after it finishes, or run the store's "
            "recover function if it crashed"
        )
    fs, marker = _fs(spark, f"{out_dir}/_committed/{run_id}")
    fs.mkdirs(marker.getParent())
    fs.create(marker, True).close()


def _schema_versions(spark: SparkSession, out_dir: str, table: str) -> list[tuple[int, str]]:
    """Sorted (version, filename) of ``_schema/<table>.v<N>.json`` files."""
    fs, sdir = _fs(spark, f"{out_dir}/_schema")
    if not fs.exists(sdir):
        return []
    out = []
    prefix = f"{table}.v"
    for st in fs.listStatus(sdir):
        name = st.getPath().getName()
        if name.startswith(prefix) and name.endswith(".json"):
            try:
                out.append((int(name[len(prefix):-len(".json")]), name))
            except ValueError:
                continue
    return sorted(out)


def update_schema_store(spark: SparkSession, out_dir: str, table: str, schema) -> None:
    """Persist the union of the store-level schema with ``schema`` —
    VERSIONED compare-and-swap, so concurrent publishers can never lose
    each other's columns (a plain read-modify-write of one file would let
    the last writer drop a column the other just committed — and an
    explicit-schema read silently omits missing columns, unlike the old
    per-read mergeSchema it replaces).

    Protocol (the Iceberg metadata-versioning emulation): read the latest
    ``_schema/<table>.v<N>.json``; if the union adds nothing, stop (no
    version churn on ordinary publishes); else atomically create
    ``v<N+1>`` with overwrite=False — a concurrent writer that claimed the
    version first makes the create fail, and we re-read and retry on top
    of ITS union. Old versions are pruned by vacuum.

    The union is additive-only: a field re-appearing with a different type
    raises — this emulation does not do type-widening evolution (that is
    Iceberg's job). Written BEFORE the run's marker: a torn run's extra
    nullable columns in the union are harmless, while the reverse order
    could commit a run whose columns the stored schema lacks."""
    import json as _json

    from pyspark.sql.types import StructType

    for _ in range(50):
        versions = _schema_versions(spark, out_dir, table)
        latest_n = versions[-1][0] if versions else 0
        existing = read_schema_store(spark, out_dir, table)
        if existing is not None:
            by_name = {f.name: f for f in existing.fields}
            for f in schema.fields:
                prev = by_name.get(f.name)
                if prev is not None and prev.dataType != f.dataType:
                    raise ValueError(
                        f"schema store {out_dir}/{table}: field {f.name!r} changed "
                        f"type {prev.dataType} -> {f.dataType}; additive-only "
                        "evolution is supported (use a new store or a real table "
                        "format for type changes)"
                    )
            new_fields = [f for f in schema.fields if f.name not in by_name]
            if not new_fields:
                return  # union adds nothing — no new version
            merged = StructType([*existing.fields, *new_fields])
        else:
            merged = schema
        # write-then-rename + nonce verify: the version file appears
        # ATOMICALLY with its full content, so a reader/merger can never
        # observe a claimed-but-empty version (which would make a
        # concurrent writer merge from the version BEFORE it and silently
        # drop this writer's columns). Rename-onto-existing fails on HDFS
        # but silently REPLACES on a POSIX local fs — so after the rename
        # we re-read and check our nonce: the loser (its content replaced,
        # or its rename failed) retries on the next version, merging on
        # top of the winner's union. No interleaving loses a column.
        import uuid as _uuid

        nonce = _uuid.uuid4().hex
        payload = {"nonce": nonce, "schema": merged.jsonValue()}
        fs, tmp = _fs(spark, f"{out_dir}/_schema/.tmp-{nonce}")
        fs.mkdirs(tmp.getParent())
        out = fs.create(tmp, True)
        out.write(bytearray(_json.dumps(payload).encode()))
        out.close()
        jpath = _fs(spark, f"{out_dir}/_schema/{table}.v{latest_n + 1}.json")[1]
        if not fs.rename(tmp, jpath):
            fs.delete(tmp, False)  # lost the version race — re-read, merge
            continue
        stream = fs.open(jpath)
        try:
            landed = _json.loads(bytes(stream.readAllBytes()).decode())
        except Exception:
            landed = {}
        finally:
            stream.close()
        if landed.get("nonce") == nonce:
            return
        # a peer replaced our rename (POSIX semantics) — retry on top
    raise IOError(
        f"schema store {out_dir}/{table}: could not claim a version after 50 "
        "attempts (pathological write contention)"
    )


def read_schema_store(spark: SparkSession, out_dir: str, table: str):
    """The latest READABLE persisted store-level schema, or None (no run
    committed yet). A torn write of the newest version file falls back to
    the version before it — never to None, which would make the next
    update's union start from scratch and drop prior columns."""
    import json as _json

    from pyspark.sql.types import StructType

    for _, name in reversed(_schema_versions(spark, out_dir, table)):
        fs, jpath = _fs(spark, f"{out_dir}/_schema/{name}")
        stream = fs.open(jpath)
        try:
            data = bytes(stream.readAllBytes())
        finally:
            stream.close()
        try:
            d = _json.loads(data.decode())
            # nonce-wrapped (current) or bare StructType json (early r5)
            return StructType.fromJson(d["schema"] if "schema" in d else d)
        except Exception:
            continue  # torn version file — try the one before it
    return None


def read_committed_table(spark: SparkSession, out_dir: str, table: str) -> DataFrame:
    """Committed-runs-only view of a marker-committed table.

    Raises FileNotFoundError with a clear message when NO run has ever
    committed (a half-written first run leaves table dirs you must not
    read — "nothing committed yet" is the only safe answer; a raw
    PATH_NOT_FOUND from the torn half would be misleading).

    Schema comes from the commit-time schema store (one tiny JSON read, no
    per-run footer fetches); stores written before the schema store existed
    fall back to ``mergeSchema``. The isin literal list grows with run
    count — ``compact_published_store`` consolidates old runs into one
    partition so the live marker set stays small (the Iceberg analogue is
    snapshot expiration); compacted rows keep their ORIGINAL ``run_id``
    via the ``src_run_id`` column, so compaction is invisible in output.
    """
    ids = committed_publish_ids(spark, out_dir)
    if not ids:
        raise FileNotFoundError(
            f"no committed runs under {out_dir} (the _committed marker set is "
            "empty — a torn first run is invisible by design)"
        )
    stored = read_schema_store(spark, out_dir, table)
    if stored is not None:
        # Spark appends the run_id partition column to a user schema and
        # NULL-fills fields absent from older files — mergeSchema semantics
        # at zero footer cost
        df = spark.read.schema(stored).parquet(f"{out_dir}/{table}")
    else:
        df = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/{table}")
    # partition filter on the committed id set: torn (marker-less) run dirs
    # are pruned at the directory level, never scanned
    df = df.filter(F.col("run_id").isin(ids))
    if "src_run_id" in df.columns:
        df = df.withColumn(
            "run_id", F.coalesce(F.col("src_run_id"), F.col("run_id"))
        ).drop("src_run_id")
    return df


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
    pub = tagged.filter(F.col("_reject").isNull()).drop("_reject")
    pub.write.mode("overwrite").parquet(f"{out_dir}/published/run_id={run_id}")
    if _crash_before_commit == "published":
        raise RuntimeError("fault injection: crashed after published half")
    quar = tagged.filter(F.col("_reject").isNotNull()).withColumnRenamed(
        "_reject", "reject_reason"
    )
    quar.write.mode("overwrite").parquet(f"{out_dir}/quarantine/run_id={run_id}")
    if _crash_before_commit == "quarantine":
        raise RuntimeError("fault injection: crashed before commit marker")
    # schema store BEFORE the marker: a crash here leaves extra nullable
    # columns in the union (harmless); the reverse order could commit a run
    # whose columns the stored schema lacks
    update_schema_store(spark, out_dir, "published", pub.schema)
    update_schema_store(spark, out_dir, "quarantine", quar.schema)
    commit_marker(spark, out_dir, run_id)  # single atomic create = the commit point
    return True


def compact_published_store(
    spark: SparkSession,
    out_dir: str,
    run_ids: list[str] | None = None,
    _test_hook_before_swap=None,
) -> str:
    """Consolidate committed runs into ONE partition and shrink the live
    marker set — the Iceberg snapshot-expiration analogue that removes the
    documented ~10^4-run ceiling of the ``isin``-literal marker list
    (VERDICT r4 #5). ``read_published``/``read_quarantine`` output is
    IDENTICAL before and after: compacted rows keep their original
    ``run_id`` through the ``src_run_id`` column the readers coalesce.

    ``run_ids=None`` compacts every currently committed run; pass an
    explicit subset to keep recent runs individually addressable (their
    markers and directories are untouched).

    Concurrency: same protocol as ``compact_dedup_index`` — a maintenance
    lease blocks new commits (``commit_marker`` refuses under it), the
    marker-dir swap is verified post-swap, and a run that slipped the
    probe-to-commit window triggers a full rollback that preserves it
    (``ConcurrentCommitError``). Crashes are adjudicated by
    ``recover_published_store``; superseded run directories are reclaimed
    by the separate ``vacuum_published_store`` step so concurrent readers
    never lose files mid-scan.
    """
    compact_id = "compact" + uuid.uuid4().hex[:12]
    acquire_maintenance_lease(
        spark, out_dir, {"distinguished": compact_id, "pre_markers": []}
    )
    pre = committed_publish_ids(spark, out_dir)  # re-capture under the lease
    # keep the lease body authoritative for recover: overwrite in place
    # (we HOLD the lease — never release/re-acquire, that window would let
    # a commit slip in unrecorded)
    import json as _json

    fs_l, lease = _fs(spark, f"{out_dir}/_compact_lease")
    out_l = fs_l.create(lease, True)
    out_l.write(bytearray(_json.dumps({"distinguished": compact_id, "pre_markers": pre}).encode()))
    out_l.close()
    targets = list(run_ids) if run_ids is not None else list(pre)
    unknown = [r for r in targets if r not in pre]
    if unknown:
        release_maintenance_lease(spark, out_dir)
        raise ValueError(f"compact_published_store: not committed: {unknown}")
    if not targets:
        release_maintenance_lease(spark, out_dir)
        raise ValueError("compact_published_store: nothing to compact")

    for table in ("published", "quarantine"):
        stored = read_schema_store(spark, out_dir, table)
        if stored is not None:
            df = spark.read.schema(stored).parquet(f"{out_dir}/{table}")
        else:
            df = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/{table}")
        df = df.filter(F.col("run_id").isin(targets))
        if "src_run_id" in df.columns:  # re-compacting an already-compacted store
            df = df.withColumn(
                "_src", F.coalesce(F.col("src_run_id"), F.col("run_id"))
            ).drop("src_run_id")
        else:
            df = df.withColumn("_src", F.col("run_id"))
        out = df.drop("run_id").withColumnRenamed("_src", "src_run_id")
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}/run_id={compact_id}")
        update_schema_store(spark, out_dir, table, out.schema)
    if _test_hook_before_swap is not None:
        _test_hook_before_swap()

    new_markers = sorted(set(pre) - set(targets)) + [compact_id]
    swap_marker_dir(spark, out_dir, new_markers, pre, "recover_published_store")
    return compact_id


def swap_marker_dir(
    spark: SparkSession,
    root: str,
    new_markers: list[str],
    pre_markers: list[str],
    recover_name: str,
) -> None:
    """Replace ``{root}/_committed`` with ``new_markers`` — the ONE
    maintenance-swap implementation every marker-committed store uses
    (publish compaction here, index compaction in operators/dedup_index),
    so the racer handling cannot drift between stores.

    Caller must HOLD the maintenance lease with body
    ``{"distinguished": <the new marker pre_markers lacks>, "pre_markers":
    [...]}``; this function releases it on every exit path except a raised
    IOError (crash-equivalent — ``recover_marker_store`` adjudicates).

    Racer handling — a commit whose lease probe passed before the lease
    landed can appear in THREE windows, all resolved as "the racer wins,
    the maintenance pass rolls back, nothing is ever lost":

    1. before the aside rename: its marker rides into ``_committed_old``
       and the post-swap verification catches it (marker not in
       ``pre_markers``) → rollback;
    2. BETWEEN the two renames: ``commit_marker``'s mkdirs recreates the
       live dir, so the activate rename fails → the racer's markers are
       merged into the aside dir, the old set is restored, rollback;
    3. after the activate rename: the marker lands in the NEW live dir —
       visible, data intact, simply not part of the compacted partition
       (for the publish store that is exactly right; the dedup index
       additionally documents the possible duplicate-signature overlap).
    """
    import json as _json

    fs, committed = _fs(spark, f"{root}/_committed")
    nxt = _fs(spark, f"{root}/_committed_next")[1]
    old = _fs(spark, f"{root}/_committed_old")[1]
    # record the full plan in the HELD lease so recover can tell racer
    # markers from our own in every crash state
    dist = sorted(set(new_markers) - set(pre_markers))
    lease_body = {
        "distinguished": dist[0] if dist else new_markers[-1],
        "pre_markers": list(pre_markers),
        "new_markers": list(new_markers),
    }
    out_l = fs.create(_fs(spark, f"{root}/_compact_lease")[1], True)
    out_l.write(bytearray(_json.dumps(lease_body).encode()))
    out_l.close()
    for stale in (nxt, old):  # debris from a previously recovered pass
        if fs.exists(stale):
            fs.delete(stale, True)
    fs.mkdirs(nxt)
    for m in new_markers:
        fs.create(_fs(spark, f"{root}/_committed_next/{m}")[1], True).close()
    if fs.exists(committed) and not fs.rename(committed, old):
        raise IOError(f"maintenance swap: could not move live marker dir aside at {root}")

    def _fold_live_racers_into_old() -> list[str]:
        """Copy every FILE marker in the live dir that is not part of the
        new set into the aside dir (racer commits must survive any
        rollback); subdirectories (nested-rename artifacts) are skipped —
        they contain only our own new markers."""
        if not fs.exists(committed):
            return []
        racers = sorted(
            s.getPath().getName()
            for s in fs.listStatus(committed)
            if s.isFile() and s.getPath().getName() not in new_markers
        )
        fs.mkdirs(old)
        for m in racers:
            fs.create(_fs(spark, f"{root}/_committed_old/{m}")[1], True).close()
        return racers

    def _rollback(racers: list[str], where: str) -> None:
        # fold window-3 racers (markers that landed in the NEW live dir
        # after activation) into the aside set BEFORE retracting it — a
        # bare delete would destroy their commits
        racers = sorted(set(racers) | set(_fold_live_racers_into_old()))
        if fs.exists(committed) and not fs.delete(committed, True):
            raise IOError(
                f"maintenance rollback: could not retract marker dir at {root} "
                f"(run {recover_name})"
            )
        if not fs.rename(old, committed):
            raise IOError(
                f"maintenance rollback: could not restore marker dir at {root} "
                f"(run {recover_name})"
            )
        if fs.exists(nxt):
            fs.delete(nxt, True)
        release_maintenance_lease(spark, root)
        raise ConcurrentCommitError(
            f"commits {sorted(racers)} landed {where} the maintenance swap of "
            f"{root}; the pass rolled back and every committed marker is "
            "intact — re-run it"
        )

    # window 2 (pre-activation): a racer recreated the live dir in the gap
    # after the aside rename — never rely on the activate rename failing
    # (HDFS renames INTO an existing dir; POSIX replaces an empty one)
    if fs.exists(committed):
        _rollback([], "inside")
    if not fs.rename(nxt, committed):
        if fs.exists(committed):  # racer appeared between the check and the rename
            _rollback([], "inside")
        raise IOError(
            f"maintenance swap: could not activate new marker dir at {root} "
            f"(run {recover_name})"
        )
    # post-activation audit: unwind a nested move (the racer-dir-existed
    # rename semantics that return true), then verify the live set
    nested = _fs(spark, f"{root}/_committed/_committed_next")[1]
    if fs.exists(nested):
        for st in fs.listStatus(nested):
            if st.isFile():
                fs.rename(st.getPath(), _fs(spark, f"{root}/_committed/{st.getPath().getName()}")[1])
        fs.delete(nested, True)
    live_now = sorted(
        s.getPath().getName() for s in fs.listStatus(committed) if s.isFile()
    )
    aside = (
        sorted(s.getPath().getName() for s in fs.listStatus(old) if s.isFile())
        if fs.exists(old)
        else []
    )
    racers = [m for m in aside if m not in pre_markers] + [
        m for m in live_now if m not in new_markers
    ]
    if racers:  # window 1 (rode the aside rename) or window 2/3 (in live)
        _rollback(racers, "during")
    if fs.exists(old):
        fs.delete(old, True)
    release_maintenance_lease(spark, root)


def recover_marker_store(spark: SparkSession, root: str) -> str:
    """Adjudicate a crashed maintenance swap from the lease record:
    complete it or roll it back. Idempotent; 'clean' when nothing is wrong.
    ONE implementation for every marker-committed store (publish archive,
    dedup index). A mid-swap racer's markers found in a live dir the
    distinguished marker never reached are merged into the restored set —
    committed markers are never stranded in ``_committed_old``."""
    lease = read_maintenance_lease(spark, root)
    if lease is None:
        return "clean"
    dist = lease.get("distinguished") or lease.get("compact_id") or lease.get("snap")
    pre = set(lease.get("pre_markers", []))
    new = set(lease.get("new_markers", [dist] if dist else []))
    fs, committed = _fs(spark, f"{root}/_committed")
    old = _fs(spark, f"{root}/_committed_old")[1]
    nxt = _fs(spark, f"{root}/_committed_next")[1]
    live = (
        sorted(s.getPath().getName() for s in fs.listStatus(committed) if s.isFile())
        if fs.exists(committed)
        else []
    )
    if dist is not None and dist in live:  # swap happened
        aside = (
            sorted(s.getPath().getName() for s in fs.listStatus(old) if s.isFile())
            if fs.exists(old)
            else []
        )
        racers = sorted(
            {m for m in aside if m not in pre} | {m for m in live if m not in new}
        )
        if racers and not fs.exists(old):
            # post-audit crash: the swap deletes the aside dir only AFTER
            # its racer audit passed, so a missing aside means the swap
            # fully completed — live racers are commits that landed after
            # activation and are already visible. Rolling back here would
            # rebuild the live set from the racers alone, dropping the
            # distinguished marker and every pre marker (all compacted
            # data would go invisible, then vacuum-deletable).
            release_maintenance_lease(spark, root)
            return f"completed (post-audit; concurrent commits already live: {racers})"
        if racers:
            # fold racers that landed in the live dir into the aside set
            # before retracting it — their commits must survive
            fs.mkdirs(old)
            for m in racers:
                fs.create(_fs(spark, f"{root}/_committed_old/{m}")[1], True).close()
            fs.delete(committed, True)
            if not fs.rename(old, committed):
                raise IOError(f"recover: could not restore marker dir at {root}")
            release_maintenance_lease(spark, root)
            return f"rolled_back (preserved concurrent commits: {racers})"
        if fs.exists(old):
            fs.delete(old, True)
        release_maintenance_lease(spark, root)
        return "completed"
    # swap incomplete (or mid-swap racer crash, or torn lease body):
    # restore the aside set, folding in any FILE markers a racer committed
    # into a recreated live dir (nested-rename artifact dirs hold only our
    # own new markers — skipped)
    if fs.exists(old):
        for m in live:
            if m not in new:
                fs.create(_fs(spark, f"{root}/_committed_old/{m}")[1], True).close()
        if fs.exists(committed):
            fs.delete(committed, True)
        if not fs.rename(old, committed):
            raise IOError(f"recover: could not restore marker dir at {root}")
    if fs.exists(nxt):
        fs.delete(nxt, True)
    release_maintenance_lease(spark, root)
    return "rolled_back"


def recover_published_store(spark: SparkSession, out_dir: str) -> str:
    """Adjudicate a crashed publish-store compaction (see
    ``recover_marker_store`` — the shared implementation)."""
    return recover_marker_store(spark, out_dir)


def vacuum_published_store(
    spark: SparkSession, out_dir: str, grace_seconds: int = 86400
) -> list[str]:
    """Delete run directories whose marker is gone (compacted away, or torn
    runs that never committed) — the deferred-GC half of compaction. Refuses
    under a live lease. Returns the removed run_ids.

    ``grace_seconds`` (Iceberg/Delta vacuum-retention analogue): a
    marker-less directory modified within the window is SKIPPED — it may be
    an IN-FLIGHT publish that has written data but not yet committed its
    marker; deleting it would leave a committed run with missing data.
    Only drop the grace (0) when no writer can be active.
    """
    if read_maintenance_lease(spark, out_dir) is not None:
        raise MaintenanceInProgressError(
            f"vacuum refused: maintenance lease held at {out_dir} "
            "(finish or recover_published_store first)"
        )
    live = set(committed_publish_ids(spark, out_dir))
    now_ms = spark._jvm.System.currentTimeMillis()
    deleted: list[str] = []
    for table in ("published", "quarantine"):
        tfs, tdir = _fs(spark, f"{out_dir}/{table}")
        if not tfs.exists(tdir):
            continue
        for st in tfs.listStatus(tdir):
            name = st.getPath().getName()
            if not name.startswith("run_id=") or name[len("run_id="):] in live:
                continue
            if now_ms - st.getModificationTime() < grace_seconds * 1000:
                continue  # possibly an in-flight commit — not torn, just young
            tfs.delete(st.getPath(), True)
            if name[len("run_id="):] not in deleted:
                deleted.append(name[len("run_id="):])
    # prune superseded schema versions: keep everything from the latest
    # READABLE version up (a torn newest file must keep its predecessor)
    import json as _json

    from pyspark.sql.types import StructType

    for table in ("published", "quarantine"):
        versions = _schema_versions(spark, out_dir, table)
        keep_from = None
        for n, name in reversed(versions):
            fs, jpath = _fs(spark, f"{out_dir}/_schema/{name}")
            stream = fs.open(jpath)
            try:
                data = bytes(stream.readAllBytes())
            finally:
                stream.close()
            try:
                # same dual-format parse as read_schema_store: current
                # versions are nonce-wrapped {"nonce":…,"schema":…}; a raw
                # StructType.fromJson on the wrapper always fails, which
                # would anchor keep_from to a stale bare-format version
                # (or never prune at all on current-format stores)
                d = _json.loads(data.decode())
                StructType.fromJson(d["schema"] if "schema" in d else d)
                keep_from = n
                break
            except Exception:
                continue
        for n, name in versions:
            if keep_from is not None and n < keep_from:
                fs, jpath = _fs(spark, f"{out_dir}/_schema/{name}")
                fs.delete(jpath, False)
    return sorted(deleted)
