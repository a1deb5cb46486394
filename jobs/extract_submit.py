"""spark-submit entry point for the extraction pipeline.

Cluster usage (the BASELINE.json deployment shape):

    zip -r batch_doc_vqa_spark.zip batch_doc_vqa_spark/
    spark-submit --py-files batch_doc_vqa_spark.zip \
        jobs/extract_submit.py \
        --pages  s3://bucket/pages/          # or any parquet/Iceberg path \
        --out    s3://bucket/extracted/ \
        --run-id run_2025_06_01 \
        --num-buckets 4096 \
        --target-rows-per-task 50000

Local smoke (synthesizes the seeded pages table when --pages is omitted):

    spark-submit --py-files batch_doc_vqa_spark.zip jobs/extract_submit.py \
        --synthesize 5000 --out /tmp/extract_out

Rerunning with the same --out resumes: urls already in the results table are
anti-joined away, per-partition lineage rows accumulate per run_id.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="input parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthesize", type=int, default=0, help="generate N seeded pages instead")
    ap.add_argument("--out", required=True, help="output dir (results/ + lineage/)")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--num-buckets", type=int, default=32)
    ap.add_argument("--target-rows-per-task", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("extract_pages")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from batch_doc_vqa_spark.plans.extract_job import run_extraction
    from batch_doc_vqa_spark.sources.pages import pages_df

    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.synthesize:
        pages = pages_df(spark, args.synthesize, seed=args.seed)
    else:
        raise SystemExit("one of --pages / --synthesize is required")

    summary = run_extraction(
        spark,
        pages,
        args.out,
        run_id=args.run_id,
        num_buckets=args.num_buckets,
        target_rows_per_task=args.target_rows_per_task,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
