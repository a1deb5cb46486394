"""Streaming twin of the portable HLL sketch: per-epoch register partials,
merged at read time — the always-fresh distinct-count a 10^12-row pipeline
keeps without ever re-scanning history.

Batch form: ``sketches.hll_partial → hll_estimate``. Streaming form: each
micro-batch of new files computes its OWN partial (one scan of the new data
only, KBs of registers per group) and commits it atomically under the
publish protocol's run-scoped marker (``partials/run_id=e<batch>``); the
estimate at any moment is ``hll_estimate`` over all COMMITTED partials —
the same merge the batch side uses, so streaming and batch agree bit-exactly
on the same input set.

The sketch's algebra does the crash-safety heavy lifting: merge is max per
(groups, bucket) — associative, commutative, IDEMPOTENT — so a replayed or
double-committed epoch cannot change the estimate (``hll_estimate``
re-merges internally), and a torn epoch is invisible until its marker
lands. No state store, no watermark: the registers ARE the state, and they
live in the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import hll_estimate, hll_partial
from ..plans.publish import _fs, commit_marker, read_committed_table


def hll_stream(
    spark: SparkSession,
    docs_dir: str,
    schema: str,
    key_col: str,
    group_cols: list[str],
    out_dir: str,
    checkpoint_dir: str,
    p: int = 12,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source stream → per-epoch HLL register partials, committed
    atomically. Read the running estimate with ``read_hll_estimate`` (or
    raw registers with ``read_hll_partials``)."""

    stream = spark.readStream.schema(schema).parquet(docs_dir)

    def sketch(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        run_id = f"e{batch_id:08d}"
        fs, marker = _fs(sess, f"{out_dir}/_committed/{run_id}")
        if fs.exists(marker):  # replay of a committed epoch
            return
        hll_partial(batch, key_col, group_cols, p).write.mode("overwrite").parquet(
            f"{out_dir}/partials/run_id={run_id}"
        )
        commit_marker(sess, out_dir, run_id)

    writer = stream.writeStream.foreachBatch(sketch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_partials(spark: SparkSession, out_dir: str) -> DataFrame:
    """All committed epochs' registers (torn epochs invisible)."""
    return read_committed_table(spark, out_dir, "partials")


def read_hll_estimate(
    spark: SparkSession, out_dir: str, group_cols: list[str], p: int = 12
) -> DataFrame:
    """(groups..., est_distinct) over every committed epoch — identical to
    the batch estimate on the union of those epochs' inputs."""
    return hll_estimate(read_hll_partials(spark, out_dir), group_cols, p)
