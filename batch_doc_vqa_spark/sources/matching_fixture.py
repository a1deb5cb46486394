"""Seeded truth/extracted matching fixture (FIXTURES.md F3).

Mirrors the reference's golden ground truth
(/root/reference/tests/data/test_ids.csv) and its matching test cases:
hyphenated and multi-token compound surnames
(/root/reference/tests/test_relaxed_name_matching.py:12-30), extracted rows
with controlled id/name perturbations so the pipeline (cross join →
Levenshtein → cutoff → groupBy min) has known expected outcomes.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

from .probs_fixture import truth_id

FIRST = ["Maria", "John", "Ana", "Wei", "Fatima", "Ivan", "Keiko", "Liam", "Nadia", "Omar"]
LAST = [
    "Garcia-Lopez", "Smith", "van der Berg", "Souza", "Al-Hassan", "Petrov",
    "Tanaka", "O-Neil", "Kovacs", "de la Cruz",
]

TRUTH_SCHEMA = "doc int, student_id string, student_full_name string"
EXTRACTED_SCHEMA = "doc int, page int, llm_id string, llm_fullname string"


def _rng(seed: int, tag: str, i: int) -> random.Random:
    h = hashlib.sha256(f"{tag}:{seed}:{i}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def truth_rows(n_docs: int = 32, seed: int = 42) -> list[tuple]:
    rows = []
    for d in range(n_docs):
        rng = _rng(seed, "truth", d)
        name = f"{rng.choice(FIRST)} {rng.choice(LAST)}"
        rows.append((d, truth_id(seed, d), name))
    return rows


def extracted_rows(n_docs: int = 32, seed: int = 42) -> list[tuple]:
    """Per doc one extraction: 60% exact id, 20% one digit off, 20% garbage;
    names: exact / hyphen→space / single-char typo."""
    rows = []
    for d, sid, name in truth_rows(n_docs, seed):
        rng = _rng(seed, "ex", d)
        u = rng.random()
        if u < 0.6:
            llm_id = sid
        elif u < 0.8:
            pos = rng.randrange(8)
            llm_id = sid[:pos] + str((int(sid[pos]) + 1) % 10) + sid[pos + 1 :]
        else:
            llm_id = "".join(str(rng.randrange(10)) for _ in range(8))
        v = rng.random()
        if v < 0.5:
            llm_name = name
        elif v < 0.8:
            llm_name = name.replace("-", " ")
        else:
            llm_name = ("X" + name[1:]) if name else name
        rows.append((d, 1, llm_id, llm_name))
    return rows


def truth_df(spark: SparkSession, n_docs: int = 32, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(truth_rows(n_docs, seed), TRUTH_SCHEMA)


def extracted_df(spark: SparkSession, n_docs: int = 32, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(extracted_rows(n_docs, seed), EXTRACTED_SCHEMA)
