"""Bucketed-table joins must be exchange-free: the write-once-shuffle,
join-many-times contract that makes repeated joins affordable at 100 TB."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from batch_doc_vqa_spark.plans.bucketed import cluster_by, read_bucketed, write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    a = spark.range(0, 5000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 2).alias("v"),
    )
    b = spark.range(0, 5000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 7).alias("w"),
    )
    write_bucketed(a, "t_results_bucketed", "url", num_buckets=8)
    write_bucketed(b, "t_costs_bucketed", "url", num_buckets=8)
    yield "t_results_bucketed", "t_costs_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_results_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_costs_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ta, tb = bucketed_tables
    j = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "url")
    p = _plan(j)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0, p[:2000]
    assert j.count() == 5000  # and it's actually correct


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    ta, _ = bucketed_tables
    agg = read_bucketed(spark, ta).groupBy("url").agg(F.sum("v").alias("s"))
    p = _plan(agg)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0, p[:2000]


def test_cluster_by_reuses_one_exchange(spark):
    df = cluster_by(
        spark.range(0, 2000).select(
            F.concat(F.lit("h"), (F.col("id") % 50).cast("string")).alias("host"),
            F.col("id").alias("v"),
        ),
        "host",
        num_buckets=8,
    )
    # two key-aligned aggregations over the clustered frame: the repartition
    # exchange is the ONLY one; the groupBys reuse its partitioning
    agg = df.groupBy("host").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    p = _plan(agg)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p[:2000]
