"""Matching-pipeline semantics tests, mirroring the reference's hand-built
cases (/root/reference/tests/test_relaxed_name_matching.py:12-61)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators import matching


@pytest.fixture(scope="module")
def fixture(spark):
    truth = spark.createDataFrame(
        [
            (1, "12345678", "Maria Garcia-Lopez"),
            (2, "87654321", "John van der Berg"),
            (3, "11112222", "Ana Souza"),
        ],
        "doc int, student_id string, student_full_name string",
    )
    extracted = spark.createDataFrame(
        [
            (1, 1, "12345678", "Maria Garcia Lopez"),   # exact id, hyphen variant name
            (2, 1, "87654320", "Jon van der Berg"),     # id dist 1
            (3, 1, "99999999", "Ana Sousa"),            # lastname dist 1, id far
            (4, 1, "55550000", "Nobody Here"),          # no match
        ],
        "doc int, page int, llm_id string, llm_fullname string",
    )
    return truth, extracted


def _ref_surname_candidates(full_name: str) -> list[str]:
    """Pure-Python port of the reference's get_surname_candidates
    (string_matching.py:46-96), lowered to match the Spark column expr."""
    tokens = [t for t in " ".join(str(full_name or "").strip().split()).split(" ") if t]
    if not tokens:
        return []
    surname_tokens = tokens[-2:] if len(tokens) >= 3 else [tokens[-1]]
    out, seen = [], set()
    for tok in surname_tokens:
        variants = [tok]
        if "-" in tok:
            parts = [p for p in tok.split("-") if p]
            variants.extend(parts)
            if "".join(parts):
                variants.append("".join(parts))
        for v in variants:
            k = v.casefold()
            if k not in seen:
                seen.add(k)
                out.append(v.lower())
    return out


def test_surname_candidates_match_reference_rules(spark):
    names = [
        "Maria Garcia-Lopez",       # 2 tokens: only the hyphenated last expands
        "John van der Berg",        # 4 tokens: last two individually
        "Ana Sousa Garcia-Lopez",   # 3 tokens incl. hyphen in last
        "Cher",                     # single token
        "  padded   name  ",        # whitespace noise
        "",                         # empty
        "A -",                      # degenerate hyphen-only token
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = df.select("name", matching.surname_candidates(F.col("name")).alias("c")).collect()
    for r in rows:
        assert sorted(r["c"]) == sorted(_ref_surname_candidates(r["name"])), r["name"]
    got = {r["name"]: list(r["c"]) for r in rows}
    assert set(got["Maria Garcia-Lopez"]) == {"garcia-lopez", "garcia", "lopez", "garcialopez"}
    assert set(got["John van der Berg"]) == {"der", "berg"}  # no space-joined variant


def test_pair_distances_and_best_matches(fixture):
    truth, extracted = fixture
    dist = matching.pair_distances(extracted, truth)
    assert dist.count() == 4 * 3  # full cross join

    d = {
        (r["doc"], r["student_id"]): (r["id_distance"], r["lastname_distance"])
        for r in dist.collect()
    }
    assert d[(1, "12345678")] == (0, 0)   # hyphen variant matches exactly
    assert d[(2, "87654321")][0] == 1
    assert d[(3, "11112222")] == (8, 1)

    best = matching.best_matches(dist)
    found = {(r["doc"], r["student_id"]): r["found"] for r in best.collect()}
    assert found[(1, "12345678")] is True
    assert found[(2, "87654321")] is True
    assert (3, "11112222") not in found  # id dist 8 > 3 and lastname dist 1 != 0
    assert all((4, sid) not in found for sid in ("12345678", "87654321", "11112222"))


def test_best_match_per_doc(fixture):
    truth, extracted = fixture
    dist = matching.pair_distances(extracted, truth)
    best = matching.best_match_per_doc(dist)
    assert best.count() == 4  # one row per extraction doc
    row1 = best.filter(F.col("doc") == 1).collect()[0]
    assert row1["student_id"] == "12345678" and row1["id_distance"] == 0


def test_digit_accuracy_exact(spark):
    df = spark.createDataFrame(
        [("12345678", "12345678"), ("12345670", "12345678")],
        "pred string, truth string",
    )
    acc = matching.digit_accuracy(df, "pred", "truth").collect()[0]["digit_top1"]
    assert acc == pytest.approx(15 / 16)
