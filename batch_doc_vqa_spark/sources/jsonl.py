"""JSON-lines crawl-dump source: the common interchange for page corpora.

Crawl exports frequently arrive as JSONL with base64-encoded payloads rather
than parquet. Reading uses an EXPLICIT schema (never inference — a schema
scan over 100 TB of JSONL is a full extra pass) and decodes the payload back
to binary with ``unbase64``, producing the same (url, warc_ts, html, text,
lang) shape as the parquet path, so the whole engine runs unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JSONL_SCHEMA = "url string, warc_ts timestamp, html_b64 string, text string, lang string"


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(JSONL_SCHEMA).json(path)
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    """Inverse: parquet-shaped pages → JSONL with base64 payloads."""
    pages.select(
        "url",
        "warc_ts",
        F.regexp_replace(F.base64("html"), "\r\n", "").alias("html_b64"),
        "text",
        "lang",
    ).write.mode("overwrite").json(path)
