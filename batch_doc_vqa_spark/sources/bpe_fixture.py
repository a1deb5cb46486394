"""Seeded text fixture for the BPE tokenizer oracles (FIXTURES.md
convention: row i is a pure function of (seed, i)).

The word pool is built from a small syllable inventory so BPE learning has
real sub-word structure to find (shared stems/suffixes), and draws are
Zipf-shaped (square-law index) so merge frequencies are skewed like real
text. Fixed N — the fixture and everything trained on it is identical at
every scale factor, which is what lets the kernel-output-as-VALUES oracles
hold at sf0.001/sf0.01/sf0.1 alike.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

BPE_N = 48
BPE_SEED = 13
BPE_MERGES = 120
BPE_MIN_FREQ = 2
BPE_MAX_WORDS = 10_000

_SYLLABLES = [
    "ar", "ben", "cor", "del", "est", "fin", "gra", "hol", "in", "jor",
    "kal", "lum", "mor", "nov", "ost", "per", "qui", "ros", "sta", "tur",
]
_SUFFIXES = ["", "a", "en", "ing", "ion", "ly", "s"]

_POOL = [
    s1 + s2 + suf
    for s1 in _SYLLABLES
    for s2 in _SYLLABLES[:8]
    for suf in _SUFFIXES
]  # 20·8·7 = 1120 words sharing stems/suffixes


def bpe_fixture_rows(n: int = BPE_N, seed: int = BPE_SEED) -> list[tuple[int, str]]:
    rows = []
    for i in range(n):
        rng = random.Random(seed * 1_000_003 + i)
        length = 20 + (i % 7) * 10
        words = [
            _POOL[int(rng.random() ** 2 * len(_POOL))] for _ in range(length)
        ]
        # sprinkle punctuation/case so the shared normalization is exercised
        text = " ".join(
            w.capitalize() + "," if rng.random() < 0.1 else w for w in words
        )
        rows.append((i, text))
    return rows


def bpe_fixture_df(spark: SparkSession, n: int = BPE_N, seed: int = BPE_SEED) -> DataFrame:
    return spark.createDataFrame(bpe_fixture_rows(n, seed), "doc_id long, text string")
