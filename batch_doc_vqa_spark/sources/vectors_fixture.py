"""Seeded vector fixture for the TRAINED quantizer oracles (FIXTURES.md
convention: row i is a pure function of (seed, i), partition-independent).

Why a fixture and not the embeddings table: the driver's parquet embeddings
differ per scale factor (same vec_id, different vector at sf0.1), so a
trained codebook baked into an oracle's VALUES would only match at one sf.
Training on this fixture keeps the model — and therefore the oracle —
identical at EVERY sf, while the encode/ADC/re-rank half still runs over
the real per-sf embeddings table in both engines.

Values are rounded to 6 decimals so the same literals round-trip exactly
through createDataFrame (Spark doubles), numpy float64 (the k-means
kernel), and SQL VALUES (DuckDB doubles).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

TRAIN_N = 96
TRAIN_DIM = 64
TRAIN_SEED = 7
TRAIN_SAMPLE = 64  # < TRAIN_N so the md5-smallest sampling is exercised


def trained_sample_rows(
    n: int = TRAIN_N, dim: int = TRAIN_DIM, seed: int = TRAIN_SEED
) -> list[tuple[int, list[float]]]:
    rows = []
    for i in range(n):
        rng = random.Random(seed * 1_000_003 + i)
        rows.append((i, [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)]))
    return rows


def trained_sample_df(
    spark: SparkSession, n: int = TRAIN_N, dim: int = TRAIN_DIM, seed: int = TRAIN_SEED
) -> DataFrame:
    return spark.createDataFrame(
        trained_sample_rows(n, dim, seed), "vec_id long, embedding array<double>"
    )
