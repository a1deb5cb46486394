"""Directory glob scan with natural ordering (S2/W4).

The reference walks a directory, regex-filters filenames, and natural-sorts
them so doc_2 precedes doc_10 (core/image_utils.py:19-28,
utils/batch_extract.py:15-24). Spark-first: the ``binaryFile`` source scans
the directory distributed (pathGlobFilter pushes the pattern into the file
index, never listing-then-filtering in Python), and natural order becomes a
derived *sort-key column* — order is data, not an iteration side effect, so
any downstream operator can restore it after a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def natural_sort_key(path_col):
    """(alpha-skeleton, [numeric runs]) — sorts doc_2 before doc_10.

    The skeleton replaces every digit run with '#' so names with identical
    text structure compare by their numeric runs as integers; Spark orders
    array<long> columns lexicographically, matching Python natural sort.
    """
    name = F.element_at(F.split(path_col, "/"), -1)
    skeleton = F.regexp_replace(name, r"\d+", "#")
    nums = F.transform(
        F.regexp_extract_all(name, F.lit(r"(\d+)"), F.lit(1)), lambda s: s.cast("long")
    )
    return F.struct(skeleton.alias("skel"), nums.alias("nums"))


def glob_scan(spark: SparkSession, directory: str, pattern: str = "*") -> DataFrame:
    """Scan files matching ``pattern`` under ``directory`` with a natural-order
    key column: (path, length, content, nat_key)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(directory)
        .select(
            "path",
            "length",
            "content",
            natural_sort_key(F.col("path")).alias("nat_key"),
        )
    )
