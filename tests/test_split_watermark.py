"""S5 document→rows fan-out and streaming watermark late-data semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from batch_doc_vqa_spark.functions.pdf_extract import encode_spdf
from batch_doc_vqa_spark.functions.udfs import split_pages
from batch_doc_vqa_spark.sources import page_row, pages_df
from batch_doc_vqa_spark.streaming import hourly_rollup_stream


def test_split_pages_fanout(spark):
    blocks = [
        ((10.0, 10.0, 200.0, 30.0), "first block"),
        ((10.0, 100.0, 200.0, 120.0), "second block"),
    ]
    rows = [("u1", encode_spdf(blocks)), ("u2", b"<html><p>not spdf</p></html>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = split_pages(df).collect()
    assert {r["url"] for r in out} == {"u1"}  # HTML docs produce no block rows
    ordered = sorted(out, key=lambda r: r["pos"])
    assert [r["block_text"] for r in ordered] == ["first block", "second block"]
    assert ordered[0]["bbox"] == [10.0, 10.0, 200.0, 30.0]


def test_split_pages_on_fixture(spark):
    pages = pages_df(spark, 120, seed=42)
    out = split_pages(pages)
    n_pdf = sum(1 for i in range(120) if page_row(42, i)["profile"] == "pdf")
    docs = out.select("url").distinct().count()
    assert docs == n_pdf
    assert out.count() > docs  # genuine fan-out: multiple blocks per doc


def test_watermark_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "late_src")
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write(rows, mode):
        spark.createDataFrame(rows, schema).write.mode(mode).parquet(src)

    # batch 1: events spanning 6 hours → watermark advances to max-2h
    write(
        [(i, t0 + dt.timedelta(minutes=20 * i), 1, "click", 1.0, "{}") for i in range(18)],
        "overwrite",
    )
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def drain():
        q = (
            hourly_rollup_stream(spark, src, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = {(r["hour"], r["n"]) for r in spark.read.parquet(sink).collect()}
    assert len(first) > 0  # windows older than the watermark were emitted

    # batch 2: one event far older than the watermark (hour 0) + one fresh
    write(
        [
            (100, t0, 1, "click", 1.0, "{}"),                              # late → dropped
            (101, t0 + dt.timedelta(hours=9), 1, "click", 1.0, "{}"),      # fresh
        ],
        "append",
    )
    drain()
    rows = spark.read.parquet(sink).collect()
    by_hour = {}
    for r in rows:
        by_hour[r["hour"]] = by_hour.get(r["hour"], 0) + r["n"]
    # the hour-0 window was already finalized: the late event must NOT appear
    # as a second emission for that window
    hour0 = [r for r in rows if r["hour"] == t0]
    assert len(hour0) <= 1
    if hour0:
        assert hour0[0]["n"] == 3  # only the original 3 events from batch 1
