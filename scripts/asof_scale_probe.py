"""Order-of-magnitude probe for asof_join: millions of events against a
per-key snapshot timeline, with PLANTED structure so correctness at scale
is asserted over EVERY row, not sampled:

- right side: for each of K keys, snapshots at ts = 100·j (j = 0..S-1),
  payload = snapshot ts (so the match is self-describing);
- left side: events with ts uniform in [0, 100·S) from a hash of the row
  id — the expected as-of match is exactly floor(ts/100)·100, a closed
  form, so `matched != expected` is a zero-cost full-corpus assertion;
- an optional naive tier (key-equi join + rts<=ts + max-per-event) shows
  the candidate blowup the window formulation avoids (~S/2 candidate rows
  per event vs 1 output row).

Everything is column math over spark.range — row i is a pure function of
i, partition-count independent, no Python on any hot path.

Usage: python scripts/asof_scale_probe.py [n_events] [n_keys] [snaps_per_key]
       [--naive] [--array]   (defaults 2_000_000 10_000 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from batch_doc_vqa_spark.operators.temporal import asof_join  # noqa: E402
from batch_doc_vqa_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_events = int(args[0]) if args else 2_000_000
    n_keys = int(args[1]) if len(args) > 1 else 10_000
    snaps = int(args[2]) if len(args) > 2 else 100
    run_naive = "--naive" in sys.argv

    spark = get_spark("asof_probe")
    spark.sparkContext.setLogLevel("ERROR")

    right = (
        spark.range(n_keys * snaps)
        .select(
            F.col("id").alias("rid"),
            F.pmod("id", F.lit(n_keys)).alias("key"),
            (F.expr(f"id div {n_keys}") * 100).alias("rts"),
        )
        .withColumn("snap_ts", F.col("rts"))
    )
    max_ts = 100 * snaps
    left = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.pmod("id", F.lit(n_keys)).alias("key"),
        F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(max_ts)).alias("ts"),
    )

    t0 = time.time()
    out = asof_join(
        left, right, ["key"], "ts", "rts", payload=["snap_ts"], tiebreak="rid"
    )
    expected = (F.col("ts") - F.pmod("ts", F.lit(100))).cast("long")
    mismatches = out.filter(
        F.col("snap_ts").isNull() | (F.col("snap_ts") != expected)
    ).count()
    n_out = out.count()
    asof_sec = round(time.time() - t0, 2)

    result = {
        "n_events": n_events,
        "n_snapshots": n_keys * snaps,
        "asof_sec": asof_sec,
        "events_per_sec": round(n_events / asof_sec),
        "mismatches": mismatches,
        "rows_out": n_out,
    }

    if "--array" in sys.argv:
        t2 = time.time()
        out_a = asof_join(
            left, right, ["key"], "ts", "rts", payload=["snap_ts"],
            tiebreak="rid", strategy="array",
        )
        arr_bad = out_a.filter(
            F.col("snap_ts").isNull() | (F.col("snap_ts") != expected)
        ).count()
        n_a = out_a.count()
        result["array_sec"] = round(time.time() - t2, 2)
        result["array_mismatches"] = arr_bad
        result["array_rows_out"] = n_a

    if run_naive:
        t1 = time.time()
        cand = left.join(right.select("key", "rts"), "key").filter(
            F.col("rts") <= F.col("ts")
        )
        naive = cand.groupBy("event_id").agg(F.max("rts").alias("snap_ts"))
        naive_bad = naive.filter(
            F.col("snap_ts")
            != (F.pmod(F.xxhash64(F.col("event_id").cast("string")), F.lit(max_ts))
                - F.pmod(
                    F.pmod(F.xxhash64(F.col("event_id").cast("string")), F.lit(max_ts)),
                    F.lit(100),
                ))
        ).count()
        result["naive_sec"] = round(time.time() - t1, 2)
        result["naive_mismatches"] = naive_bad
        result["naive_candidate_rows"] = cand.count()

    print(json.dumps(result))
    assert mismatches == 0, "asof correctness violated at scale"


if __name__ == "__main__":
    main()
