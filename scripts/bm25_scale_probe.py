"""Order-of-magnitude probe for bm25_topk: a ~1M-doc synthetic corpus with
PLANTED queries whose expected winner is exact, asserted over every query:

- corpus: row i is a pure function of i (seeded vocab of common filler
  terms — every doc shares them, so they act as realistic low-idf noise);
- every doc whose id is a multiple of ``stride`` additionally carries the
  unique term ``uq<i>`` (nowhere else in the corpus, df=1, tf=1);
- queries: ``uq<i>`` plus two filler terms. The unique term's idf
  (ln(1 + (N-0.5)/1.5) ≈ ln(N)) dwarfs any filler-term sum, so doc i MUST
  rank 1 for query i — ``top1 != i`` is a zero-cost full-set assertion.

The probe is also the measurement behind ``max_df_frac``: every query
shares two high-df filler terms, so the score join's intermediate size is
Σ_t df(t)·|queries with t| ≈ 0.8M·500 — hundreds of millions of rows whose
idf ≈ ln(2) cannot move any ranking. Default mode prunes them
(``max_df_frac=0.05``); ``--full`` runs the exact unpruned semantics. The
planted winner is identical in both modes (the unique term decides).

``--persist`` measures the build/query split instead: bm25_build (full
vocabulary) → save_bm25_index to a temp store → load → TWO bm25_query
batches — the one-time index cost vs the per-batch marginal cost a
standing deployment actually pays.

Usage: python scripts/bm25_scale_probe.py [n_docs] [n_queries] [--full] [--persist]
       (defaults 1_000_000 500)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from batch_doc_vqa_spark.operators.retrieval import bm25_topk  # noqa: E402
from batch_doc_vqa_spark.session import get_spark  # noqa: E402

_FILLER = [
    "alpha", "bravo", "carbon", "delta", "ember", "fjord", "gamma", "harbor",
    "indigo", "joule", "kelvin", "lumen", "meadow", "nickel", "onyx", "plateau",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 1_000_000
    n_queries = int(args[1]) if len(args) > 1 else 500
    stride = max(1, n_docs // n_queries)

    spark = get_spark("bm25_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # 8 filler terms per doc, chosen by integer math; planted docs append
    # their unique term
    fillers = F.array(*[F.lit(w) for w in _FILLER])
    words = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.element_at(
            fillers,
            (F.pmod(F.col("id") * 31 + j * 7, F.lit(16)) + 1).cast("int"),
        ),
    )
    text = F.array_join(words, " ")
    text = F.when(
        F.pmod("id", F.lit(stride)) == 0,
        F.concat(text, F.lit(" uq"), F.col("id").cast("string")),
    ).otherwise(text)
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))

    queries = spark.range(n_queries).select(
        (F.col("id") * stride).alias("qdoc"),
    ).select(
        F.col("qdoc").alias("query_id"),
        F.concat(
            F.lit("uq"), F.col("qdoc").cast("string"), F.lit(" alpha bravo")
        ).alias("query_text"),
    )

    frac = None if "--full" in sys.argv else 0.05
    if "--persist" in sys.argv:
        import shutil
        import tempfile

        from batch_doc_vqa_spark.operators.retrieval import (
            bm25_build,
            bm25_query,
            load_bm25_index,
            save_bm25_index,
        )

        root = tempfile.mkdtemp(prefix="bm25_probe_store_")
        t0 = time.time()
        save_bm25_index(bm25_build(docs, "doc_id", "text"), f"{root}/idx")
        build_s = time.time() - t0
        loaded = load_bm25_index(spark, f"{root}/idx")
        batch_s = []
        bad = n_won = 0
        for _ in range(2):
            t1 = time.time()
            top = bm25_query(loaded, queries, k=3, max_df_frac=frac)
            row = (
                top.filter(F.col("rank") == 1)
                .agg(
                    F.count(F.lit(1)).alias("n_won"),
                    F.sum((F.col("query_id") != F.col("doc_id")).cast("int")).alias("bad"),
                )
                .collect()[0]
            )
            bad, n_won = row["bad"], row["n_won"]
            batch_s.append(round(time.time() - t1, 1))
        shutil.rmtree(root)
        print(
            json.dumps(
                {
                    "mode": "persist",
                    "max_df_frac": frac,
                    "n_docs": n_docs,
                    "n_queries": n_queries,
                    "build_s": round(build_s, 1),
                    "query_batch_s": batch_s,
                    "top1_mismatches": bad,
                    "queries_answered": n_won,
                }
            )
        )
        return

    t0 = time.time()
    top = bm25_topk(docs, queries, k=3, max_df_frac=frac)
    # one aggregate = one execution of the whole pipeline
    row = (
        top.filter(F.col("rank") == 1)
        .agg(
            F.count(F.lit(1)).alias("n_won"),
            F.sum((F.col("query_id") != F.col("doc_id")).cast("int")).alias("bad"),
        )
        .collect()[0]
    )
    bad, n_won = row["bad"], row["n_won"]
    total_s = time.time() - t0

    print(
        json.dumps(
            {
                "max_df_frac": frac,
                "n_docs": n_docs,
                "n_queries": n_queries,
                "top1_mismatches": bad,
                "queries_answered": n_won,
                "total_s": round(total_s, 1),
                "docs_per_sec": round(n_docs / total_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
