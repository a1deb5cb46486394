"""Seeded digit-probability matrix fixture (FIXTURES.md F5).

Shape of the reference's CV inference output
(/root/reference/tests/cv_row_tables.py:532-536, consumed by
tests/prob_calibration.py:10-39): one row per digit cell — 8 per document —
with a 10-way probability distribution biased toward the true digit.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

PROBS_SCHEMA = "doc int, pos int, probs array<double>, truth_digit int"


def truth_id(seed: int, doc: int) -> str:
    h = hashlib.sha256(f"id:{seed}:{doc}".encode()).digest()
    return "".join(str(h[j] % 10) for j in range(8))


def probs_rows(n_docs: int = 32, seed: int = 42, noise: float = 0.15) -> list[tuple]:
    rows = []
    for doc in range(n_docs):
        tid = truth_id(seed, doc)
        for pos in range(8):
            rng = random.Random(
                int.from_bytes(hashlib.sha256(f"p:{seed}:{doc}:{pos}".encode()).digest()[:8], "big")
            )
            truth = int(tid[pos])
            raw = [noise * rng.random() for _ in range(10)]
            raw[truth] += 1.0 if rng.random() > 0.05 else 0.0  # 5% hard cells
            s = sum(raw)
            rows.append((doc, pos, [round(v / s, 8) for v in raw], truth))
    return rows


def probs_df(spark: SparkSession, n_docs: int = 32, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(probs_rows(n_docs, seed), PROBS_SCHEMA)


def truth_df(spark: SparkSession, n_docs: int = 32, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(
        [(d, truth_id(seed, d)) for d in range(n_docs)], "doc int, student_id string"
    )
