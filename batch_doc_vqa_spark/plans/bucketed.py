"""Bucketed-table sink: pre-shuffled storage for co-located joins (S9+).

At 100 TB the dominant recurring cost is re-shuffling the results table for
every downstream join (enrichment, scoring, dedup-index refresh). Writing it
``bucketBy(N, key)`` pays that shuffle ONCE at write time; every later
equi-join or aggregation on the key runs exchange-free because both sides'
partitioning is already aligned (Spark's bucketing handshake; the Iceberg
equivalent is a ``bucket(N, key)`` partition transform).

The bucket count is part of the table contract — joins co-locate only when
both tables share (key, N) — so it's recorded in the table properties and
asserted on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Persist ``df`` as a managed table bucketed+sorted by ``key``.

    sortBy(key) within buckets additionally lets merge-joins skip their sort
    (files are already key-ordered) — the read side becomes a zero-exchange,
    zero-sort join.
    """
    # managed table in the session warehouse (no explicit path)
    df.write.mode(mode).bucketBy(num_buckets, key).sortBy(key).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cluster_by(df: DataFrame, key: str, num_buckets: int = 64) -> DataFrame:
    """In-memory analogue for one-shot pipelines: repartition on the key so
    several downstream key-aligned operations reuse ONE exchange.

    Catalyst reuses the resulting hash partitioning for every subsequent
    groupBy/join on the same key in the same plan — the shuffle happens once
    instead of per-operation.
    """
    return df.repartition(num_buckets, key)
