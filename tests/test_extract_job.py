"""End-to-end extraction job: byte-identity vs oracle, lineage, resume.

The resume test is the graft analogue of the reference's incremental
checkpoint + idempotent backfill
(/root/reference/src/batch_doc_vqa/openrouter/inference.py:2206-2207,
api.py:501-560): run on a prefix, rerun on the full input, assert the second
run only touched the remainder and the final table equals a one-shot run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_doc_vqa_spark.functions import extract_payload
from batch_doc_vqa_spark.plans import read_lineage, read_results, run_extraction, salted_host_stats
from batch_doc_vqa_spark.sources import page_row, pages_df

N = 300
SEED = 42


def test_job_end_to_end(spark, tmp_path):
    pages = pages_df(spark, N, seed=SEED)
    summary = run_extraction(spark, pages, str(tmp_path / "out"), run_id="r1", num_buckets=8)
    assert summary["n_docs"] == N
    assert summary["n_failed"] == 0
    assert summary["n_partitions"] <= 8

    results = read_results(spark, str(tmp_path / "out"))
    assert results.count() == N
    assert results.select("url").distinct().count() == N

    # byte-identity per url against the oracle kernel, on a sample
    got = {r["url"]: r["text"] for r in results.collect()}
    for i in range(0, N, 7):
        row = page_row(SEED, i)
        oracle = extract_payload(row["html"])
        assert got[row["url"]] == oracle.text, row["url"]
        assert got[row["url"]].encode("utf-8") == oracle.text.encode("utf-8")

    # lineage totals reconcile with the results table
    lin = read_lineage(spark, str(tmp_path / "out"))
    tot = lin.agg(F.sum("n_docs").alias("d"), F.sum("n_bytes").alias("b")).collect()[0]
    assert tot["d"] == N
    assert tot["b"] == results.agg(F.sum("n_input_bytes")).collect()[0][0]
    # bucket ids are data-defined: every result bucket appears in lineage
    assert lin.select("bucket").distinct().count() == results.select("bucket").distinct().count()


def test_strict_mode_routes_failures_to_lineage(spark, tmp_path):
    pages = pages_df(spark, 50, seed=SEED)
    # corrupt some payloads so extraction yields nothing for them
    broken = pages.withColumn(
        "html",
        F.when(F.xxhash64("url") % 5 == 0, F.lit(b"")).otherwise(F.col("html")),
    )
    out = str(tmp_path / "strict")
    s = run_extraction(spark, broken, out, run_id="strictrun", num_buckets=4, strict=True)
    assert s["n_failed"] > 0
    res = read_results(spark, out)
    failed = res.filter(F.col("status") == "failed")
    assert failed.count() == s["n_failed"]
    assert failed.filter(F.col("text").isNotNull()).count() == 0  # fail-row: no text
    lin = read_lineage(spark, out)
    urls = [u for r in lin.collect() for u in r["failure_urls"]]
    assert len(urls) == s["n_failed"]
    # lenient mode on the same input keeps the rows as 'empty'-free successes
    out2 = str(tmp_path / "lenient")
    s2 = run_extraction(spark, broken, out2, run_id="lenientrun", num_buckets=4, strict=False)
    assert s2["n_failed"] == 0


def test_resume_is_idempotent_and_incremental(spark, tmp_path):
    full = pages_df(spark, N, seed=SEED)
    prefix = full.filter(F.xxhash64("url") % 2 == 0)  # deterministic half
    out = str(tmp_path / "resume")

    s1 = run_extraction(spark, prefix, out, run_id="runA", num_buckets=8)
    s2 = run_extraction(spark, full, out, run_id="runB", num_buckets=8)
    assert s1["n_docs"] + s2["n_docs"] == N
    assert s2["n_docs"] < N  # second run did only the remainder

    # third run: nothing left to do
    s3 = run_extraction(spark, full, out, run_id="runC", num_buckets=8)
    assert s3["n_docs"] == 0

    resumed = read_results(spark, out)
    assert resumed.count() == N
    assert resumed.select("url").distinct().count() == N

    # final table identical to a one-shot run (url → text bytes)
    oneshot = str(tmp_path / "oneshot")
    run_extraction(spark, full, oneshot, run_id="solo", num_buckets=8)
    a = {r["url"]: r["text"] for r in resumed.collect()}
    b = {r["url"]: r["text"] for r in read_results(spark, oneshot).collect()}
    assert a == b


def test_salted_partitioning_bounds_hot_host(spark, tmp_path):
    pages = pages_df(spark, N, seed=SEED)
    stats = salted_host_stats(pages)
    rows = {r["host"]: r["n_rows"] for r in stats.collect()}
    assert sum(rows.values()) == N
    hottest = max(rows.values())
    assert hottest > N * 0.1  # the synthetic skew is real

    # salted extraction: hot host spread over multiple buckets
    out = str(tmp_path / "salted")
    run_extraction(spark, pages, out, run_id="rs", num_buckets=16, target_rows_per_task=10)
    res = read_results(spark, str(tmp_path / "salted"))
    hot_host = max(rows, key=rows.get)
    buckets = (
        res.filter(F.col("url").contains(hot_host)).select("bucket").distinct().count()
    )
    assert buckets > 1  # not funneled into a single task
    assert res.count() == N
