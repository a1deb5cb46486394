"""Streaming twin of the validation-gated publish sink (S11).

Batch form: ``plans/publish.publish_run`` tags rows with a reject reason and
splits them into published/quarantine tables. Streaming form: the SAME
column-expression gate (``publish_reject_reason`` — one definition, no
drift) runs inside ``foreachBatch``, so each micro-batch appends its clean
rows to ``published/`` and its rejects to ``quarantine/`` with exactly-once
semantics from the stream checkpoint. ``trigger(availableNow=True)`` turns
this into an incremental batch publisher: rerun it after new result files
land and only the new files flow through the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.publish import publish_reject_reason


def gated_publish_stream(
    spark: SparkSession,
    results_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str | None = "text",
    numeric_cols: tuple[str, ...] = (),
    json_cols: tuple[str, ...] = (),
    decode_status_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source results stream → gate → published/quarantine appends."""
    stream = spark.readStream.schema(schema).parquet(results_dir)
    reason = publish_reject_reason(text_col, numeric_cols, json_cols, decode_status_col)

    def publish_batch(batch: DataFrame, batch_id: int) -> None:
        tagged = batch.withColumn("_reject", reason).localCheckpoint(eager=True)
        tagged.filter(F.col("_reject").isNull()).drop("_reject").write.mode("append").parquet(
            f"{out_dir}/published"
        )
        tagged.filter(F.col("_reject").isNotNull()).withColumnRenamed(
            "_reject", "reject_reason"
        ).write.mode("append").parquet(f"{out_dir}/quarantine")

    writer = stream.writeStream.foreachBatch(publish_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
