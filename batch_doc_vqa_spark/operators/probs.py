"""Probabilistic digit analytics: candidate scoring join, top-k accuracy.

Re-expresses the reference's CV detection math:
- J8 probabilistic candidate join —
  /root/reference/tests/cv_row_tables.py:438-478 (`get_predicted_labels`):
  every document's 8 digit distributions × every candidate ID, score =
  ∏ p(digit_i), argmax per doc, detection cutoff 1e3·0.1^8;
- A21 top-k digit accuracy — tests/prob_calibration.py:122-141: truth digit
  within the k most probable classes, averaged over cells.

All column expressions: the candidate set broadcasts, products run as
exp(sum(log)) with map-side combine, ranking is one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DETECTION_CUTOFF = 1e3 * 0.1**8  # reference: cv_row_tables.py:13,478


def score_candidates(probs: DataFrame, candidates: DataFrame) -> DataFrame:
    """∏ p(candidate digit at pos) per (doc, candidate) — J8.

    ``probs``: (doc, pos, probs array<double>[10]); ``candidates``:
    (student_id 8-digit string). Candidate digits explode to (pos, digit),
    broadcast-join on pos, probability looked up by array index.
    """
    cand = candidates.select(
        "student_id",
        F.posexplode(F.split(F.lpad("student_id", 8, "0"), "")).alias("pos", "d"),
    ).select("student_id", "pos", F.col("d").cast("int").alias("d"))
    j = probs.join(F.broadcast(cand), "pos").select(
        "doc",
        "student_id",
        F.element_at("probs", F.col("d") + 1).alias("p"),
    )
    return j.groupBy("doc", "student_id").agg(
        F.round(
            F.when(F.max((F.col("p") <= 0).cast("int")) == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(F.log(F.when(F.col("p") > 0, F.col("p")))))
            ),
            12,  # cross-engine exp/log ulp differences wash out; cutoff is 1e-5
        ).alias("score")
    )


def predict_ids(probs: DataFrame, candidates: DataFrame, cutoff: float = DETECTION_CUTOFF) -> DataFrame:
    """Best candidate per doc with detection threshold (J8 + W2)."""
    scores = score_candidates(probs, candidates)
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("student_id"))
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("detected", F.col("score") >= cutoff)
    )


def topk_digit_accuracy(probs: DataFrame, ks: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Share of cells whose truth digit is among the k most probable (A21).

    Rank of the truth digit under (prob desc, digit asc) = #{digits with
    higher prob} + #{lower digits with equal prob}; hit_k ⇔ rank < k. A
    counting filter beats sorting the array: O(10) per cell, no sort.
    """
    pt = F.element_at("probs", F.col("truth_digit") + 1)
    pairs = F.zip_with(
        F.col("probs"),
        F.sequence(F.lit(0), F.lit(9)),
        lambda p, d: F.struct(p.alias("p"), d.alias("d")),
    )
    rank = F.size(
        F.filter(
            pairs,
            lambda s: (s["p"] > pt) | ((s["p"] == pt) & (s["d"] < F.col("truth_digit"))),
        )
    )
    cols = [
        F.round(F.avg((rank < k).cast("double")), 6).alias(f"top{k}_acc") for k in ks
    ]
    return probs.agg(*cols)
