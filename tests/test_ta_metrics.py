"""TA metric kernels (A9-A14) on hand-built cases with exact expected values,
mirroring /root/reference/tests/test_ta_metrics.py style."""

from __future__ import annotations

import pytest

from batch_doc_vqa_spark.operators import ta_metrics


def test_cer_case_sensitive(spark):
    pairs = spark.createDataFrame(
        [("kitten", "sitting"), ("abc", "abc"), ("Case", "case")],
        "gt string, pred string",
    )
    r = ta_metrics.cer(pairs, "gt", "pred").collect()[0]
    # lev: 3 + 0 + 1 (case-sensitive!) over gt lens 6+3+4
    assert r["cer"] == pytest.approx((3 + 0 + 1) / 13, abs=1e-6)
    assert r["mean_norm_lev"] == pytest.approx((3 / 7 + 0 + 1 / 4) / 3, abs=1e-6)


def test_set_prf(spark):
    gt = spark.createDataFrame([(1, "a"), (1, "b"), (2, "x")], "doc_id int, item string")
    pred = spark.createDataFrame([(1, "a"), (1, "c"), (2, "x"), (2, "y")], "doc_id int, item string")
    rows = {r["doc_id"]: r for r in ta_metrics.set_prf(gt, pred).collect()}
    assert (rows[1]["tp"], rows[1]["fp"], rows[1]["fn"]) == (1, 1, 1)
    assert (rows[2]["tp"], rows[2]["fp"], rows[2]["fn"]) == (1, 1, 0)


def test_macro_f1_by_tag(spark):
    gt = spark.createDataFrame([(1, "sign"), (2, "sign"), (1, "algebra")], "doc_id int, item string")
    pred = spark.createDataFrame([(1, "sign"), (2, "sign"), (2, "algebra")], "doc_id int, item string")
    rows = {r["item"]: r["f1"] for r in ta_metrics.macro_f1_by_tag(gt, pred).collect()}
    assert rows["sign"] == 1.0
    assert rows["algebra"] == pytest.approx(0.0)  # tp=0, fp=1, fn=1


def test_exact_match_skips_empty_gt(spark):
    pairs = spark.createDataFrame(
        [("v1", "v1"), ("v2", "x"), ("", "anything"), (None, "y")], "gt string, pred string"
    )
    r = ta_metrics.exact_match_rate(pairs, "gt", "pred").collect()[0]
    assert r["n"] == 2 and r["exact_match"] == 0.5


def test_rubric_mae_missing_pred_is_zero(spark):
    gt = spark.createDataFrame(
        [(1, "p1", "c1", 2.0), (1, "p1", "c2", 1.0), (1, "p2", "c1", 3.0)],
        "doc int, problem_uid string, criterion_id string, awarded_points double",
    )
    pred = spark.createDataFrame(
        [(1, "p1", "c1", 2.0), (1, "p1", "c2", 0.5)],
        "doc int, problem_uid string, criterion_id string, awarded_points double",
    )
    r = ta_metrics.rubric_mae(gt, pred, ["doc", "problem_uid", "criterion_id"]).collect()[0]
    # diffs: 0, 0.5, 3.0 (missing → 0.0)
    assert r["mae"] == pytest.approx(3.5 / 3, abs=1e-6)
    assert r["exact_rate"] == pytest.approx(1 / 3, abs=1e-6)


def test_qwk_perfect_and_known(spark):
    perfect = spark.createDataFrame([(i % 3, i % 3) for i in range(9)], "t int, p int")
    assert ta_metrics.quadratic_weighted_kappa(perfect, "t", "p", 3).collect()[0]["qwk"] == 1.0
    # hand-computed case: t=[0,1,2,2], p=[0,2,2,1], k=3 → w=(d²/4)
    pairs = spark.createDataFrame([(0, 0), (1, 2), (2, 2), (2, 1)], "t int, p int")
    # O: (0,0)=1 w0; (1,2)=1 w=1/4; (2,2)=1 w0; (2,1)=1 w=1/4 → wo=0.5
    # marginals t: {0:1,1:1,2:2}, p: {0:1,1:1,2:2}, n=4
    # we = Σ w_ij·mt_i·mp_j/4 ; w matrix d²/4
    we = sum(
        ((i - j) ** 2 / 4) * mt * mp / 4
        for i, mt in {0: 1, 1: 1, 2: 2}.items()
        for j, mp in {0: 1, 1: 1, 2: 2}.items()
    )
    expected = round(1 - 0.5 / we, 6)
    got = ta_metrics.quadratic_weighted_kappa(pairs, "t", "p", 3).collect()[0]["qwk"]
    assert got == pytest.approx(expected, abs=1e-6)


def test_feedback_agreement(spark):
    gt = spark.createDataFrame(
        [(1, "p1", 2, 1, 1), (1, "p2", 3, 2, 0)],
        "doc int, problem_uid string, specificity int, actionability int, correctness int",
    )
    pred = spark.createDataFrame(
        [(1, "p1", 2, 0, 1), (1, "p2", 3, 2, 1)],
        "doc int, problem_uid string, specificity int, actionability int, correctness int",
    )
    rows = {
        r["dim"]: r["agreement"]
        for r in ta_metrics.feedback_agreement(
            gt, pred, ["doc", "problem_uid"], ["specificity", "actionability", "correctness"]
        ).collect()
    }
    assert rows == {"specificity": 1.0, "actionability": 0.5, "correctness": 0.5}
