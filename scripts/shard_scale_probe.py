"""Order-of-magnitude probe for assign_shards: 20M docs laid out into
token-balanced shards, with the layout's invariants asserted over EVERY
shard in two aggregates (never collected row-wise):

- conservation: Σ shard_tokens == Σ input tokens (the layout drops and
  duplicates nothing);
- balance: every shard except the last holds tokens in
  (target − max_doc, target + max_doc): shard s covers the docs whose
  start offset lies in [s·T, (s+1)·T), and each boundary doc shifts the
  realized edge by less than one document in either direction;
- determinism: the layout at 8× more blocks is IDENTICAL (two-layer
  prefix sum is partition- and block-carve-independent) — checked via a
  full anti-join count.

Row i is a pure function of i (tokens = 50 + (i*37) % 450), no Python
anywhere.

Usage: python scripts/shard_scale_probe.py [n_docs] [target_tokens]
       (defaults 20_000_000 1_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from batch_doc_vqa_spark.operators.packing import assign_shards, shard_stats  # noqa: E402
from batch_doc_vqa_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 20_000_000
    target = int(args[1]) if len(args) > 1 else 1_000_000

    spark = get_spark("shard_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.lit(50) + F.pmod(F.col("id") * 37, F.lit(450))).alias("n_tokens"),
    )
    max_doc = 50 + 449

    t0 = time.time()
    sharded = assign_shards(docs, "doc_id", "n_tokens", target, seed=7)
    stats = shard_stats(sharded, "n_tokens").localCheckpoint(eager=True)
    layout_s = time.time() - t0

    agg = stats.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("shard_tokens").alias("total"),
        F.max("shard_id").alias("last"),
    ).collect()[0]
    bad_balance = stats.filter(
        (F.col("shard_id") != agg["last"])
        & (
            (F.col("shard_tokens") <= target - max_doc)
            | (F.col("shard_tokens") >= target + max_doc)
        )
    ).count()
    expected_total = docs.agg(F.sum("n_tokens")).collect()[0][0]

    # block-carve independence: 8× smaller blocks, identical layout
    alt = assign_shards(docs, "doc_id", "n_tokens", target, seed=7, block_size=1 << 37)
    diff = (
        sharded.select("doc_id", "shard_id", "shard_offset", "shard_pos")
        .exceptAll(alt.select("doc_id", "shard_id", "shard_offset", "shard_pos"))
        .limit(1)
        .count()
    )

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "target_tokens": target,
                "n_shards": agg["n_shards"],
                "layout_s": round(layout_s, 1),
                "docs_per_sec": round(n_docs / layout_s, 1),
                "tokens_conserved": bool(agg["total"] == expected_total),
                "balance_violations": bad_balance,
                "carve_mismatch_rows": diff,
            }
        )
    )


if __name__ == "__main__":
    main()
