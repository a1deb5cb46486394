"""Seeded labeled seed set for the learned quality classifier (FIXTURES.md
convention: row i is a pure function of (seed, i)).

The wiki-vs-crawl stand-in: label 1 = "content-like" texts drawn from a
diverse vocabulary with function words; label 0 = "spam-like" texts
dominated by promo tokens and heavy repetition. Fixed N — the trained
model (and the VALUES-embedded oracle weights) is identical everywhere.
"""

from __future__ import annotations

import random

CLF_N = 80
CLF_SEED = 23
CLF_BUCKETS = 4096
CLF_EPOCHS = 200
CLF_LR = 20.0

_CONTENT = (
    "the river basin holds sediment and the survey recorded depth with "
    "annual variation that scientists compare from archive records"
).split()
_SPAM = (
    "buy cheap now click free offer deal win cash bonus claim prize "
    "subscribe discount limited sale"
).split()


def clf_fixture_rows(n: int = CLF_N, seed: int = CLF_SEED) -> list[tuple[int, str]]:
    """(label, text) rows, alternating labels."""
    rows = []
    for i in range(n):
        rng = random.Random(seed * 1_000_003 + i)
        label = i % 2
        pool = _CONTENT if label else _SPAM
        words = [pool[int(rng.random() * len(pool))] for _ in range(30)]
        rows.append((label, " ".join(words)))
    return rows


def trained_quality_model() -> tuple[float, dict[int, float]]:
    """The offline-trained model — deterministic, so the Spark query and
    the DuckDB oracle derive the identical weights independently."""
    from ..functions.linear_clf import train_logreg

    return train_logreg(clf_fixture_rows(), CLF_BUCKETS, CLF_EPOCHS, CLF_LR)
