"""Cost lattice (A6/A16), runtime guard (A7), failure counts (A22),
probabilistic candidate join (J8), top-k digit accuracy (A21), key cascade
(J3), page merge (U5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators import keys, probs, runs_analytics
from batch_doc_vqa_spark.sources.probs_fixture import probs_df, truth_df, truth_id
from batch_doc_vqa_spark.sources.runs_fixture import results_df


RESULT_COLS = (
    "run_name string, url string, prompt_tokens long, completion_tokens long, "
    "actual_cost double, cost_is_estimated boolean, generation_id string, "
    "failure_marker string, elapsed_seconds double"
)


def _res(spark, rows):
    return spark.createDataFrame(rows, RESULT_COLS)


def test_cost_lattice_statuses(spark):
    rows = [
        # r1: all precise
        ("r1", "u1", 10, 5, 1e-4, False, "g", "", 1.0),
        ("r1", "u2", 10, 5, 2e-4, False, "g", "", 1.0),
        # r2: one missing → partial, total_cost NULL
        ("r2", "u1", 10, 5, 1e-4, False, "g", "", 1.0),
        ("r2", "u2", 10, 5, None, False, None, "", 1.0),
        # r3: estimated present
        ("r3", "u1", 10, 5, 1e-4, True, "g", "", 1.0),
        # r4: all zero → verified_zero
        ("r4", "u1", 10, 5, 0.0, False, "g", "", 1.0),
        ("r4", "u2", 10, 5, 0.0, False, "g", "", 1.0),
        # r5: all missing → unavailable
        ("r5", "u1", 10, 5, None, False, None, "", 1.0),
    ]
    out = {r["run_name"]: r for r in runs_analytics.cost_rollup(_res(spark, rows)).collect()}
    assert out["r1"]["cost_status"] == "precise" and out["r1"]["total_cost"] == pytest.approx(3e-4)
    assert out["r2"]["cost_status"] == "partial" and out["r2"]["total_cost"] is None
    assert out["r3"]["cost_status"] == "estimated"
    assert out["r4"]["cost_status"] == "verified_zero" and out["r4"]["total_cost"] == 0.0
    assert out["r5"]["cost_status"] == "unavailable" and out["r5"]["total_cost"] is None
    assert out["r1"]["prompt_tokens"] == 20


def test_parallel_runtime_requires_full_coverage(spark):
    rows = [
        ("r1", "u1", 1, 1, None, False, None, "", 5.0),
        ("r1", "u2", 1, 1, None, False, None, "", 9.0),
        ("r2", "u1", 1, 1, None, False, None, "", 5.0),
        ("r2", "u2", 1, 1, None, False, None, "", None),  # untimed row
    ]
    out = {r["run_name"]: r for r in runs_analytics.parallel_runtime(_res(spark, rows)).collect()}
    assert out["r1"]["parallel_runtime_seconds"] == 9.0
    assert out["r2"]["parallel_runtime_seconds"] is None  # reference guard


def test_failure_counts(spark):
    df = results_df(spark, n_runs=2)
    out = runs_analytics.failure_counts(df)
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == df.count()
    reasons = {r["reason"] for r in out.collect()}
    assert "ok" in reasons and any(r.startswith("_") for r in reasons)


def test_fixture_covers_all_cost_classes(spark):
    roll = runs_analytics.cost_rollup(results_df(spark, n_runs=6)).collect()
    # every run has a mix → partial dominates; the per-row classes all appear
    sums = {
        "missing": sum(r["n_missing"] for r in roll),
        "estimated": sum(r["n_estimated"] for r in roll),
        "zero": sum(r["n_zero"] for r in roll),
        "precise": sum(r["n_precise"] for r in roll),
    }
    assert all(v > 0 for v in sums.values())


def test_score_candidates_exact_math(spark):
    # 2 positions (pad to 8 with zeros ⇒ positions 0-5 are '0'), uniform probs
    probs_rows = [(1, p, [0.1] * 10, 0) for p in range(8)]
    pdf = spark.createDataFrame(probs_rows, "doc int, pos int, probs array<double>, truth_digit int")
    cands = spark.createDataFrame([("00000000",), ("00000001",)], "student_id string")
    scores = {r["student_id"]: r["score"] for r in probs.score_candidates(pdf, cands).collect()}
    assert scores["00000000"] == pytest.approx(0.1**8, rel=1e-9)
    assert scores["00000001"] == pytest.approx(0.1**8, rel=1e-9)


def test_predict_ids_on_fixture(spark):
    n_docs = 16
    pdf = probs_df(spark, n_docs)
    cands = truth_df(spark, n_docs)
    pred = probs.predict_ids(pdf, cands)
    rows = {r["doc"]: r for r in pred.collect()}
    assert len(rows) == n_docs
    correct = sum(1 for d, r in rows.items() if r["student_id"] == truth_id(42, d))
    assert correct >= n_docs - 2  # strong truth bias in the fixture
    assert all(isinstance(r["detected"], bool) for r in rows.values())


def test_topk_digit_accuracy(spark):
    rows = [
        # truth has top prob → hit at k=1
        (1, 0, [0.5, 0.3, 0.2] + [0.0] * 7, 0),
        # truth is 2nd → hit only at k>=2
        (1, 1, [0.5, 0.3, 0.2] + [0.0] * 7, 1),
        # truth is 3rd → hit only at k>=3
        (1, 2, [0.5, 0.3, 0.2] + [0.0] * 7, 2),
    ]
    pdf = spark.createDataFrame(rows, "doc int, pos int, probs array<double>, truth_digit int")
    r = probs.topk_digit_accuracy(pdf).collect()[0]
    assert r["top1_acc"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["top2_acc"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["top3_acc"] == pytest.approx(1.0)


def test_resolve_key_cascade(spark):
    rows = spark.createDataFrame(
        [("/abs/path/a.png",), ("relative/b.png",), ("x/amb.png",), ("y/missing.png",)],
        "filename string",
    )
    lookup = spark.createDataFrame(
        [
            ("/abs/path/a.png", "A"),
            ("other/dir/b.png", "B"),        # matches by unique basename
            ("p1/amb.png", "C1"),
            ("p2/amb.png", "C2"),            # ambiguous basename → no match
        ],
        "path string, val string",
    )
    out = {r["filename"]: r for r in keys.resolve_key_cascade(rows, lookup, "filename", "path", ["val"]).collect()}
    assert out["/abs/path/a.png"]["val"] == "A" and out["/abs/path/a.png"]["resolution"] == "exact"
    assert out["relative/b.png"]["val"] == "B" and out["relative/b.png"]["resolution"] == "basename"
    assert out["x/amb.png"]["val"] is None and out["x/amb.png"]["resolution"] == "unmatched"
    assert out["y/missing.png"]["val"] is None


def test_merge_page_entries_first_page_wins(spark):
    entries = spark.createDataFrame(
        [
            (1, "name", 2, "from-page-2"),
            (1, "name", 1, "from-page-1"),
            (1, "name", 3, "from-page-3"),
            (1, "id", 2, "only-page-2"),
            (2, "name", 1, ""),             # empty skipped
            (2, "name", 4, "late-but-first-nonempty"),
        ],
        "doc int, uid string, page int, value string",
    )
    out = {(r["doc"], r["uid"]): r["value"] for r in keys.merge_page_entries(entries).collect()}
    assert out[(1, "name")] == "from-page-1"
    assert out[(1, "id")] == "only-page-2"
    assert out[(2, "name")] == "late-but-first-nonempty"


def test_glob_scan_natural_order(spark, tmp_path):
    """S2/W4: pathGlobFilter scan + natural sort key — doc_2 before doc_10."""
    from batch_doc_vqa_spark.sources import glob_scan

    d = tmp_path / "docs"
    d.mkdir()
    for name in ["doc_10_page2.bin", "doc_2_page1.bin", "doc_1_page1.bin", "skip.txt"]:
        (d / name).write_bytes(name.encode())
    df = glob_scan(spark, str(d), pattern="*.bin")
    ordered = [r["path"].rsplit("/", 1)[-1] for r in df.orderBy("nat_key").collect()]
    assert ordered == ["doc_1_page1.bin", "doc_2_page1.bin", "doc_10_page2.bin"]
    assert df.count() == 3  # glob filtered out skip.txt
    row = df.filter(F.col("path").contains("doc_2_")).collect()[0]
    assert bytes(row["content"]) == b"doc_2_page1.bin"


def test_rewrite_legacy_aliases(spark):
    """P3: legacy-only renames; mixed-era coalesces with canonical winning."""
    legacy_only = spark.createDataFrame([(1, "a")], "id long, ufid string")
    out = keys.rewrite_legacy_aliases(legacy_only, {"ufid": "university_id"})
    assert out.columns == ["id", "university_id"]
    mixed = spark.createDataFrame(
        [(1, "old1", None), (2, None, "new2"), (3, "old3", "new3")],
        "id long, ufid string, university_id string",
    )
    got = {r["id"]: r["university_id"] for r in
           keys.rewrite_legacy_aliases(mixed, {"ufid": "university_id"}).collect()}
    assert got == {1: "old1", 2: "new2", 3: "new3"}
