"""Document-structure scoring: greedy bipartite region matching + P/R/F1.

Reimplements the TA-benchmark metric kernel semantics of
/root/reference/src/batch_doc_vqa/ta_benchmark/metrics.py — IoU at :81-98,
greedy matching at :279-304 (same page+kind, best IoU ≥ threshold, each
prediction used once), micro P/R/F1 at :395-406 — Spark-first: the per-doc
greedy loop is inherently sequential *within* a document, so it runs as an
``applyInPandas`` grouped-map (the one justified grouped-Python op), and the
micro aggregation is a plain ``agg``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IOU_THRESHOLD = 0.5

MATCH_SCHEMA = "doc_id long, tp long, fp long, fn long"


def iou_expr(a, b):
    """IoU of two bbox columns (array<double> [x1,y1,x2,y2]) — pure columns."""
    ix1 = F.greatest(a[0], b[0])
    iy1 = F.greatest(a[1], b[1])
    ix2 = F.least(a[2], b[2])
    iy2 = F.least(a[3], b[3])
    iw = F.greatest(ix2 - ix1, F.lit(0.0))
    ih = F.greatest(iy2 - iy1, F.lit(0.0))
    inter = iw * ih
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])  # noqa: E731
    union = area(a) + area(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _iou(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / union if union > 0 else 0.0


def greedy_region_match(labels: DataFrame, preds: DataFrame, threshold: float = IOU_THRESHOLD) -> DataFrame:
    """Per-doc TP/FP/FN via greedy IoU matching.

    Inputs: rows (doc_id, page, kind, bbox:array<double>). Ground-truth
    regions match the best unused prediction with same (page, kind) and
    IoU ≥ threshold — greedy in GT order, each prediction consumed once.
    """
    lab = labels.select("doc_id", "page", "kind", "bbox").withColumn("_side", F.lit("gt"))
    pre = preds.select("doc_id", "page", "kind", "bbox").withColumn("_side", F.lit("pred"))
    both = lab.unionByName(pre)

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        doc = pdf["doc_id"].iloc[0]
        gts = pdf[pdf["_side"] == "gt"]
        prs = pdf[pdf["_side"] == "pred"]
        used: set[int] = set()
        tp = 0
        # greedy bipartite matching is order-dependent (GT order decides which
        # prediction is consumed; pred order breaks IoU ties) — applyInPandas
        # delivers the group in arbitrary order, so sort by a pure-data key to
        # keep results partition- and rerun-independent.
        _key = lambda r: (r.page, r.kind, tuple(float(v) for v in r.bbox))  # noqa: E731
        gt_rows = sorted(gts.itertuples(index=False), key=_key)
        pr_rows = sorted(prs.itertuples(index=False), key=_key)
        for g in gt_rows:
            best_j, best_iou = -1, 0.0
            for j, p in enumerate(pr_rows):
                if j in used or p.page != g.page or p.kind != g.kind:
                    continue
                v = _iou(list(g.bbox), list(p.bbox))
                if v > best_iou:
                    best_j, best_iou = j, v
            if best_j >= 0 and best_iou >= threshold:
                used.add(best_j)
                tp += 1
        return pd.DataFrame(
            {"doc_id": [doc], "tp": [tp], "fp": [len(pr_rows) - tp], "fn": [len(gt_rows) - tp]}
        )

    return both.groupBy("doc_id").applyInPandas(match, schema=MATCH_SCHEMA)


def micro_prf(matched: DataFrame) -> DataFrame:
    """Micro precision/recall/F1 over per-doc TP/FP/FN counts."""
    agg = matched.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    return agg.select(
        "tp", "fp", "fn",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0), 6).alias("f1"),
    )
