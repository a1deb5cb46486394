"""Streaming exact dedup: ``dropDuplicatesWithinWatermark`` over an id key.

The streaming twin of ``dedup.exact_dedup``'s id-uniqueness guarantee: late
re-deliveries of the same event (at-least-once sources) are dropped as long
as they arrive within the watermark, with bounded state — the watermark lets
Spark evict seen-keys older than the lateness bound, so state never grows
with the full stream history (the property that matters at 100 TB/day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def dedup_events_stream(
    spark: SparkSession, events_dir: str, lateness: str = "1 hour"
) -> DataFrame:
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    return stream.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(["event_id"])
