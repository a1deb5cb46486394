"""Scaling-efficiency evidence for the north rule: same job, two parallelism
levels (local[8] vs local[32] standing in for N vs 4N executors), identical
input, report docs/sec at both + efficiency = (T8/T32)/4.

Each level runs in a fresh subprocess so the JVM/thread pool is sized cleanly.
Writes BENCH/BASELINE.md with the measured numbers.

Usage: python scripts/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from batch_doc_vqa_spark.session import get_spark
from batch_doc_vqa_spark.functions.udfs import extract_udf
from batch_doc_vqa_spark.sources.pages import pages_df

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark("scaling", master=f"local[{cores}]", shuffle_partitions=cores)
pages = pages_df(spark, n, seed=42, partitions=cores * 2)
pages = pages.persist()
pages.count()  # materialize input so we time extraction, not generation
t0 = time.perf_counter()
out = pages.withColumn("_ex", extract_udf(F.col("html"))).select(
    F.length("_ex.text").alias("nc"))
rows = out.agg(F.count(F.lit(1)), F.sum("nc")).collect()[0][0]
dt = time.perf_counter() - t0
print(json.dumps({"cores": cores, "rows": rows, "sec": dt, "docs_per_sec": rows / dt}))
"""


def run_level(cores: int, n_pages: int) -> dict:
    code = _WORKER % {"repo": REPO}
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_pages)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    lo = run_level(8, n_pages)
    hi = run_level(32, n_pages)
    eff = (lo["sec"] / hi["sec"]) / 4.0
    report = {
        "n_pages": n_pages,
        "local8_docs_per_sec": round(lo["docs_per_sec"], 1),
        "local32_docs_per_sec": round(hi["docs_per_sec"], 1),
        "local8_sec": round(lo["sec"], 2),
        "local32_sec": round(hi["sec"], 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured numbers\n\n"
            "North-rule scaling evidence: the extraction job (seeded synthetic\n"
            "Common-Crawl-style pages, Arrow-batched extract UDF, salted hash(url)\n"
            "partitioning) run at two parallelism levels on identical input —\n"
            "local[8] vs local[32] standing in for N vs 4N executors.\n\n"
            f"| metric | value |\n|---|---|\n"
            f"| pages | {n_pages} |\n"
            f"| docs/sec @ local[8] | {report['local8_docs_per_sec']} |\n"
            f"| docs/sec @ local[32] | {report['local32_docs_per_sec']} |\n"
            f"| wall sec @ local[8] | {report['local8_sec']} |\n"
            f"| wall sec @ local[32] | {report['local32_sec']} |\n"
            f"| scaling efficiency (T8/T32)/4 | {report['scaling_efficiency']} |\n\n"
            "Target (BASELINE.json): efficiency >= 0.8 from N to 4N.\n"
        )


if __name__ == "__main__":
    main()
