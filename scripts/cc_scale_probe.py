"""Order-of-magnitude probe for the two connected-component resolvers, with
PLANTED components so correctness at scale is asserted over EVERY node:

- star clusters: K clusters of M nodes each, edges (hub, hub+j) — the
  near-dup-cluster shape (diameter 2), expected component = the hub id;
- long chains: L chains of CH nodes, edges (v, v+1) — the adversarial
  high-diameter shape, expected component = the chain's base id.

Every node's expected label is a closed form of its id, so
``component != expected`` is a zero-cost full-graph assertion. Both
resolvers (min-label propagation + pointer jumping, and large-star/
small-star contraction) run on the identical edge set and must agree with
the closed form exactly.

Everything derives from spark.range column math — row i is a pure function
of i, partition-count independent, no Python anywhere.

Usage: python scripts/cc_scale_probe.py [K] [M] [L] [CH]
       (defaults 20000 10 2000 256)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from batch_doc_vqa_spark.operators.dedup import resolve_clusters  # noqa: E402
from batch_doc_vqa_spark.operators.graphs import connected_components  # noqa: E402
from batch_doc_vqa_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k_stars = int(args[0]) if args else 20_000
    m = int(args[1]) if len(args) > 1 else 10
    l_chains = int(args[2]) if len(args) > 2 else 2_000
    ch = int(args[3]) if len(args) > 3 else 256

    spark = get_spark("cc_probe")
    spark.sparkContext.setLogLevel("ERROR")

    chain_base = k_stars * m
    stars = spark.range(k_stars * (m - 1)).select(
        (F.expr(f"(id - pmod(id, {m - 1})) div {m - 1}") * m).alias("_hub"),
        (F.pmod("id", F.lit(m - 1)) + 1).alias("_j"),
    ).select(
        F.col("_hub").alias("id_a"), (F.col("_hub") + F.col("_j")).alias("id_b")
    )
    chains = spark.range(l_chains * (ch - 1)).select(
        (F.expr(f"(id - pmod(id, {ch - 1})) div {ch - 1}") * ch + chain_base).alias("_cb"),
        F.pmod("id", F.lit(ch - 1)).alias("_j"),
    ).select(
        (F.col("_cb") + F.col("_j")).alias("id_a"),
        (F.col("_cb") + F.col("_j") + 1).alias("id_b"),
    )
    pairs = stars.unionByName(chains).localCheckpoint(eager=True)
    n_nodes = k_stars * m + l_chains * ch
    ids = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    # closed-form expected component for any node id
    expected = F.when(
        F.col("id") < chain_base,
        F.expr(f"(id - pmod(id, {m})) div {m}") * m,
    ).otherwise(
        F.expr(f"((id - {chain_base}) - pmod(id - {chain_base}, {ch})) div {ch}") * ch
        + chain_base
    )

    report = {
        "nodes": n_nodes,
        "edges": pairs.count(),
        "star_clusters": k_stars,
        "chain_clusters": l_chains,
        "chain_diameter": ch - 1,
    }
    for name, fn in (
        ("starcc", lambda: connected_components(ids, pairs, id_col="doc_id")),
        ("label", lambda: resolve_clusters(ids, pairs, id_col="doc_id")),
    ):
        t0 = time.time()
        out = fn()
        lbl = out.columns[1]
        bad = (
            out.withColumn("_exp", expected)
            .filter(F.col(lbl) != F.col("_exp"))
            .count()
        )
        report[f"{name}_s"] = round(time.time() - t0, 1)
        report[f"{name}_mismatches"] = bad
    print(json.dumps(report))


if __name__ == "__main__":
    main()
