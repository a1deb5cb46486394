"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM-side ``zip_with`` +
``aggregate`` dot products — no Python), and a random-hyperplane LSH variant
as the scale path: sign-bit signatures bucket the corpus so each query only
scores its own buckets. The LSH projection matrix is a fixed seeded literal,
so bucketing is deterministic.

At 100 TB the broadcast side is the *query* set (small); the corpus stays
partitioned and is scanned once per batch of queries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_sim(a, b, digits: int = 6):
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), digits)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus scan + window rank."""
    joined = corpus.crossJoin(F.broadcast(queries)).filter(F.col(id_col) != F.col(q_id_col))
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine_sim(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_signature(vec_col, dim: int, n_planes: int = 16, seed: int = 11):
    """Sign-bit LSH signature as a JVM-side expression over a literal matrix."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(v)) for v in planes[p]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig * 2 + b
    return sig


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    ``n_tables`` independent sign-bit signatures (different seeded planes);
    a corpus vector is a candidate for a query if they collide in ANY table.
    Candidates are deduped before the (expensive) exact cosine, then ranked.
    Recall vs ``cosine_topk`` is asserted in tests. The shuffle key is
    (table, signature) — corpus-linear; the query side broadcasts.
    """

    def with_sigs(df, vcol):
        sigs = F.array(
            *[hyperplane_signature(F.col(vcol), dim, n_planes, seed=11 + t) for t in range(n_tables)]
        )
        return df.select("*", F.posexplode(sigs).alias("_t", "_sig"))

    c = with_sigs(corpus, vec_col)
    q = with_sigs(queries, q_vec_col)
    cand = (
        c.join(F.broadcast(q), ["_t", "_sig"])
        .filter(F.col(id_col) != F.col(q_id_col))
        .dropDuplicates([q_id_col, id_col])
    )
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine_sim(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
