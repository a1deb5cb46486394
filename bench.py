"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "docs_per_sec": <extraction>}

The headline metric is the BASELINE.json one — extracted docs/sec over the
synthetic Common-Crawl-style pages table — plus wall-clock for the
representative relational/dedup/similarity queries on the driver's tables.
Run scripts/scaling_bench.py for the N-vs-4N parallelism evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from batch_doc_vqa_spark.functions.udfs import extract_udf  # noqa: E402
from batch_doc_vqa_spark.session import get_spark  # noqa: E402
from batch_doc_vqa_spark.sources.pages import pages_df, rows_for_sf  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "revenue_by_order",
    "region_rollup",
    "best_order_per_customer",
    "supplier_customer_match",
    "events_hourly",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ann_cosine_topk",
    "doc_quality",
    "lang_id",
    "fingerprint",
    "sessionize_events",
    "matching_pipeline",
    "winnow_fingerprints",
    "media_probe",
    "dedup_resolve",
    "ann_ivf_topk",
    "embedding_dup_pairs_lsh",
    "publish_gate",
    # round 3: the scale dedup composition, schema ladder, cohort pipeline,
    # and real-PDF extraction
    "dedup_resolve_lsh",
    "validate_coerce",
    "cohort_stats",
    "pdf_text_extract",
    "repetition_scores",
    "media_decode",
    "url_dedup",
    "boilerplate_lines",
    "chunk_documents",
    "deterministic_sample",
    "corpus_filter",
    "strip_boilerplate",
    "training_pipeline",
    "duplicate_spans",
    "dedup_spans_removed",
    "trigram_entropy",
    # round 4: strict ladder tier, decontamination pair, PII cascade
    "validate_strict",
    "contamination_report",
    "decontaminate",
    "pii_report",
    "pii_redact",
    "pack_sequences",
    "epoch_expand",
    "budget_select",
    "training_recipe_v2",
    "snapshot_diff",
    "ann_pq_topk",
]


REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def best_of(fn, reps: int = REPS) -> float:
    """Min over reps — this sandbox is a shared box with bursty CPU steal
    (single timings swing 2-3×, see .claude/skills/verify/SKILL.md); the min
    is the least-contended estimate of the actual plan cost."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = entrymod._sf_of(sf_dir)
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    timings: dict[str, float] = {}

    # headline: extraction throughput on the seeded pages table at this sf.
    # Input is materialized (a real job reads parquet) and UDF workers are
    # warmed (executors are long-lived on a cluster) before the timed pass.
    n_pages = rows_for_sf(sf)
    pages = pages_df(spark, n_pages, seed=42, partitions=cpus * 2).persist()
    pages.count()
    warm = pages_df(spark, cpus * 64, seed=7, partitions=cpus)
    warm.withColumn("_ex", extract_udf(F.col("html"))).select(F.length("_ex.text")).count()
    extracted = pages.withColumn("_ex", extract_udf(F.col("html"))).select(
        F.length("_ex.text").alias("n"), F.col("_ex.status")
    )
    n_rows = extracted.agg(F.count(F.lit(1)), F.sum("n")).collect()[0][0]
    t_extract = best_of(lambda: extracted.agg(F.count(F.lit(1)), F.sum("n")).collect())
    timings["extract_pages"] = round(t_extract, 3)
    docs_per_sec = round(n_rows / t_extract, 1)
    pages.unpersist()

    qs = entrymod.queries()
    for name in BENCH_QUERIES:

        def run(name=name):
            df = qs[name](spark, sf_dir)
            # force evaluation of EVERY output column: a bare count(1) lets
            # Catalyst prune unused projections, so projection-only queries
            # (doc_quality, lang_id, fingerprint, winnow) would time a row
            # scan. xxhash64 over all columns keeps each expression in the
            # plan; try_sum because summing int64 hashes overflows under ANSI.
            df.agg(F.try_sum(F.xxhash64(*[F.col(c).cast("string") for c in df.columns]))).collect()

        timings[name] = round(best_of(run), 3)

    # SimHash impl costing (VERDICT r3 #2): the oracle-checked simhash_pairs
    # entry above is the SQL+md5 verification tier; time the production
    # default (Arrow UDF) and the pure-JVM xxhash64 tier on the same input
    # so the sql-vs-udf tradeoff carries numbers, not prose.
    from batch_doc_vqa_spark.operators import dedup as _dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for label, kwargs in [
        ("simhash_pairs_udf", dict(impl="udf")),
        ("simhash_pairs_sql_xxh", dict(impl="sql", base_hash="xxhash64")),
    ]:
        def run_impl(kwargs=kwargs):
            df = _dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3, **kwargs)
            df.agg(F.try_sum(F.xxhash64(*[F.col(c).cast("string") for c in df.columns]))).collect()

        timings[label] = round(best_of(run_impl), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "extract_docs": n_rows,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
