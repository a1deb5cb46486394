"""Greedy IoU region matching (A8), bootstrap CI (A15), cohort selection (W3).

Fixtures mirror the reference's hand-built cases: IoU values straddling the
0.5 threshold (/root/reference/tests/test_ta_metrics.py style) and runs
inside/outside the 24h cohort window."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators import analytics, regions


def test_iou_expr_and_greedy_matching(spark):
    labels = spark.createDataFrame(
        [
            (1, 1, "figure", [0.0, 0.0, 10.0, 10.0]),   # matched (IoU ≈ 0.68)
            (1, 1, "figure", [20.0, 20.0, 30.0, 30.0]), # unmatched (pred IoU < 0.5)
            (1, 2, "text", [0.0, 0.0, 5.0, 5.0]),       # wrong-page pred only → FN
        ],
        "doc_id long, page int, kind string, bbox array<double>",
    )
    preds = spark.createDataFrame(
        [
            (1, 1, "figure", [1.0, 1.0, 10.0, 10.0]),    # good overlap
            (1, 1, "figure", [26.0, 26.0, 36.0, 36.0]),  # IoU 16/184 ≈ 0.087 → FP
            (1, 3, "text", [0.0, 0.0, 5.0, 5.0]),        # page 3 ≠ 2 → FP
        ],
        "doc_id long, page int, kind string, bbox array<double>",
    )
    m = regions.greedy_region_match(labels, preds).collect()[0]
    assert (m["tp"], m["fp"], m["fn"]) == (1, 2, 2)
    prf = regions.micro_prf(regions.greedy_region_match(labels, preds)).collect()[0]
    assert prf["precision"] == pytest.approx(1 / 3, abs=1e-6)
    assert prf["recall"] == pytest.approx(1 / 3, abs=1e-6)


def test_iou_expr_matches_kernel(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 10.0, 10.0])], "a array<double>, b array<double>"
    )
    v = df.select(regions.iou_expr(F.col("a"), F.col("b")).alias("iou")).collect()[0]["iou"]
    assert v == pytest.approx(81 / 100, abs=1e-9)


def test_bootstrap_median_ci_deterministic(spark):
    rows = [("m1", float(v)) for v in [1, 2, 3, 4, 100]] + [("m2", 5.0), ("m2", 6.0)]
    df = spark.createDataFrame(rows, "model string, metric double")
    a = {r["model"]: r for r in analytics.bootstrap_median_ci(df, "model", "metric").collect()}
    assert a["m1"]["median"] == 3.0
    assert a["m1"]["ci_low"] is not None and a["m1"]["ci_low"] <= 3.0 <= a["m1"]["ci_high"]
    assert a["m2"]["ci_low"] is None  # n < 3 → no CI (reference rule)
    # deterministic across reruns and partitioning
    b = {
        r["model"]: r
        for r in analytics.bootstrap_median_ci(df.repartition(7), "model", "metric").collect()
    }
    assert a["m1"] == b["m1"]


def test_select_cohorts_window(spark):
    t0 = dt.datetime(2025, 5, 10, 12, 0, 0)
    rows = [
        ("m1", "fpA", t0, "r-anchor"),
        ("m1", "fpA", t0 - dt.timedelta(hours=23), "r-in"),
        ("m1", "fpA", t0 - dt.timedelta(hours=25), "r-out-time"),
        ("m1", "fpB", t0 - dt.timedelta(hours=1), "r-out-fp"),
        ("m2", "fpC", t0 - dt.timedelta(hours=2), "r-m2-anchor"),
    ]
    runs = spark.createDataFrame(rows, "model_key string, fingerprint string, ts timestamp, run_name string")
    cohort = {r["run_name"] for r in analytics.select_cohorts(runs).collect()}
    assert cohort == {"r-anchor", "r-in", "r-m2-anchor"}


def test_greedy_conflict_resolved_in_data_order(spark):
    """Two GTs both overlap one pred above threshold: greedy gives it to the
    first GT in the sorted-by-(page, kind, bbox) order, the other is a FN —
    and the result is identical under different partitionings."""
    labels = spark.createDataFrame(
        [
            (1, 1, "figure", [0.0, 0.0, 10.0, 10.0]),
            (1, 1, "figure", [2.0, 2.0, 12.0, 12.0]),
        ],
        "doc_id long, page int, kind string, bbox array<double>",
    )
    preds = spark.createDataFrame(
        [(1, 1, "figure", [1.0, 1.0, 11.0, 11.0])],
        "doc_id long, page int, kind string, bbox array<double>",
    )
    for parts in (1, 7):
        m = regions.greedy_region_match(
            labels.repartition(parts), preds.repartition(parts)
        ).collect()[0]
        assert (m["tp"], m["fp"], m["fn"]) == (1, 0, 1)
