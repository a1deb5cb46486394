"""TA-benchmark metric kernels: CER, set-diff P/R/F1, exact match, rubric
MAE, quadratic weighted kappa, feedback agreement.

DataFrame re-expressions of
/root/reference/src/batch_doc_vqa/ta_benchmark/metrics.py:
- CER / normalized edit distance (:307-317, finalized :423-424) — NOTE the TA
  Levenshtein is case-SENSITIVE (:9-27), unlike the matching pipeline's
  casefolded variant (SURVEY.md §7.3 trap);
- set-difference counting for figure pairs / error tags (:320-356): TP/FP/FN
  via full-outer join on (doc, item), macro-F1 per tag (:412-421);
- exact-match accuracy over docs with non-empty ground truth (:330-335);
- rubric MAE with missing-prediction → 0.0 (:358-369);
- quadratic weighted kappa (:191-228) — contingency via groupBy + broadcast
  marginal cross, no grouped Python;
- feedback-dimension agreement (:371-381) via stack() unpivot.

Everything is built-in expressions; inputs are flattened rows (explode the
nested F7 label documents first — see tests for the shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cer(pairs: DataFrame, gt_col: str, pred_col: str) -> DataFrame:
    """Corpus CER + mean normalized edit distance over text pairs (A9)."""
    lev = F.levenshtein(F.col(gt_col), F.col(pred_col))  # case-sensitive
    norm = lev / F.greatest(F.length(gt_col), F.length(pred_col), F.lit(1))
    return pairs.agg(
        F.round(
            F.sum(lev).cast("double") / F.sum(F.greatest(F.length(gt_col), F.lit(1))), 6
        ).alias("cer"),
        F.round(F.avg(norm), 6).alias("mean_norm_lev"),
    )


def set_prf(
    gt_items: DataFrame, pred_items: DataFrame, doc_col: str = "doc_id", item_col: str = "item"
) -> DataFrame:
    """Per-doc TP/FP/FN from item sets via full-outer join (A10)."""
    g = gt_items.select(doc_col, item_col).distinct().withColumn("_g", F.lit(1))
    p = pred_items.select(doc_col, item_col).distinct().withColumn("_p", F.lit(1))
    j = g.join(p, [doc_col, item_col], "full_outer")
    return j.groupBy(doc_col).agg(
        F.sum((F.col("_g").isNotNull() & F.col("_p").isNotNull()).cast("long")).alias("tp"),
        F.sum((F.col("_g").isNull() & F.col("_p").isNotNull()).cast("long")).alias("fp"),
        F.sum((F.col("_g").isNotNull() & F.col("_p").isNull()).cast("long")).alias("fn"),
    )


def macro_f1_by_tag(
    gt_items: DataFrame, pred_items: DataFrame, doc_col: str = "doc_id", tag_col: str = "item"
) -> DataFrame:
    """Per-tag F1 over per-doc set differences, then macro average (A10)."""
    g = gt_items.select(doc_col, tag_col).distinct().withColumn("_g", F.lit(1))
    p = pred_items.select(doc_col, tag_col).distinct().withColumn("_p", F.lit(1))
    j = g.join(p, [doc_col, tag_col], "full_outer")
    per_tag = j.groupBy(tag_col).agg(
        F.sum((F.col("_g").isNotNull() & F.col("_p").isNotNull()).cast("long")).alias("tp"),
        F.sum((F.col("_g").isNull() & F.col("_p").isNotNull()).cast("long")).alias("fp"),
        F.sum((F.col("_g").isNotNull() & F.col("_p").isNull()).cast("long")).alias("fn"),
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    return per_tag.withColumn("f1", F.round(f1, 6))


def exact_match_rate(pairs: DataFrame, gt_col: str, pred_col: str) -> DataFrame:
    """Accuracy over rows with non-empty ground truth (A11)."""
    nonempty = pairs.filter(F.col(gt_col).isNotNull() & (F.col(gt_col) != ""))
    return nonempty.agg(
        F.round(F.avg((F.col(gt_col) == F.col(pred_col)).cast("double")), 6).alias("exact_match"),
        F.count(F.lit(1)).alias("n"),
    )


def rubric_mae(gt: DataFrame, pred: DataFrame, keys: list[str], score_col: str = "awarded_points") -> DataFrame:
    """MAE + exact rate over rubric keys; missing prediction scores as 0.0
    (A12, reference metrics.py:358-369)."""
    p = pred.select(*keys, F.col(score_col).alias("_pred"))
    j = gt.select(*keys, F.col(score_col).alias("_gt")).join(p, keys, "left")
    diff = F.abs(F.col("_gt") - F.coalesce(F.col("_pred"), F.lit(0.0)))
    return j.agg(
        F.round(F.avg(diff), 6).alias("mae"),
        F.round(F.avg((diff == 0).cast("double")), 6).alias("exact_rate"),
        F.count(F.lit(1)).alias("n"),
    )


def quadratic_weighted_kappa(pairs: DataFrame, t_col: str, p_col: str, n_labels: int) -> DataFrame:
    """QWK over integer label pairs in [0, n_labels) (A13).

    kappa = 1 - Σ w_ij·O_ij / Σ w_ij·E_ij with w_ij = (i-j)²/(k-1)²,
    O = joint counts, E = outer product of marginals / n. The contingency
    table and marginals are tiny aggregates; the cross is a broadcast join.
    """
    obs = pairs.groupBy(F.col(t_col).alias("_t"), F.col(p_col).alias("_p")).agg(
        F.count(F.lit(1)).alias("o")
    )
    mt = pairs.groupBy(F.col(t_col).alias("_t")).agg(F.count(F.lit(1)).alias("mt"))
    mp = pairs.groupBy(F.col(p_col).alias("_p")).agg(F.count(F.lit(1)).alias("mp"))
    # n stays in-plan (1-row broadcast), no extra driver-side job
    tot = pairs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    grid = F.broadcast(mt).crossJoin(F.broadcast(mp))
    full = grid.join(obs, ["_t", "_p"], "left").fillna({"o": 0}).crossJoin(F.broadcast(tot))
    d = F.col("_t") - F.col("_p")
    w = (d * d) / float((n_labels - 1) ** 2)
    agg = full.agg(
        F.sum(w * F.col("o")).alias("wo"),
        F.sum(w * F.col("mt") * F.col("mp") / F.col("_n")).alias("we"),
    )
    return agg.select(
        F.round(
            F.when(F.col("we") > 0, 1.0 - F.col("wo") / F.col("we")).otherwise(F.lit(1.0)), 6
        ).alias("qwk")
    )


def feedback_agreement(gt: DataFrame, pred: DataFrame, keys: list[str], dims: list[str]) -> DataFrame:
    """Per-dimension match rate over joined feedback rows (A14)."""
    p = pred.select(*keys, *[F.col(d).alias(f"_p_{d}") for d in dims])
    j = gt.join(p, keys, "inner")
    stacked = j.select(
        F.expr(
            "stack({n}, {args}) as (dim, agree)".format(
                n=len(dims),
                args=", ".join(f"'{d}', CAST({d} = _p_{d} AS DOUBLE)" for d in dims),
            )
        )
    )
    return stacked.groupBy("dim").agg(F.round(F.avg("agree"), 6).alias("agreement"))
