"""Benchmark-analytics operators: windows, frontiers, binning, rollups.

DataFrame re-expressions of the reference's analytics kernels — Pareto
frontier (/root/reference/src/batch_doc_vqa/benchmarks/pareto_plot.py:23-40),
latest-run-per-key cohort anchoring (benchmarks/cohorts.py:110-183), top-N
ranking (benchmarks/table_generator.py:1773-1801), calibration binning
(tests/prob_calibration.py:32-37) and count-if rollups.
"""

from __future__ import annotations

import hashlib
import random
import statistics

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(df: DataFrame, cost_col: str, value_col: str) -> DataFrame:
    """Rows not dominated by any strictly-cheaper row with ≥ value (W5).

    Expressed as a NOT EXISTS anti-join rather than a running-max window so
    the plan has no single-partition global sort; with AQE the anti-join
    broadcasts when the input is small. The reference applies this to
    aggregate-level benchmark points (dozens of rows); for raw-table-scale
    inputs use ``pareto_frontier_scalable``.
    """
    other = df.select(F.col(cost_col).alias("_c"), F.col(value_col).alias("_v"))
    cond = (F.col("_c") < F.col(cost_col)) & (F.col("_v") >= F.col(value_col))
    return df.join(other, cond, "left_anti")


def pareto_frontier_scalable(df: DataFrame, cost_col: str, value_col: str) -> DataFrame:
    """Exact distributed skyline: per-partition local frontier → global
    frontier of the (small) candidate union.

    Dominance is transitive, so a point dominated anywhere is dominated
    within its partition or by another partition's survivor — phase 1 never
    drops a global-frontier point, phase 2 removes cross-partition dominance
    exactly. Phase 1 is a linear scan after an in-partition sort; phase 2
    runs on the union of local frontiers, which is tiny for any realistic
    value distribution, so the final anti-join broadcasts.
    """
    import pandas as pd

    cols = df.columns
    schema = df.schema

    def local_frontier(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized: a row survives iff value > max(value) over all strictly
        # cheaper rows — cummax of per-cost maxima shifted by one cost group
        if pdf.empty:
            return pdf.iloc[0:0]
        s = pdf.sort_values([cost_col, value_col], ascending=[True, False])
        prev_best = (
            s.groupby(cost_col, sort=True)[value_col].max().cummax().shift(1, fill_value=float("-inf"))
        )
        mask = s[value_col].to_numpy() > prev_best.reindex(s[cost_col]).to_numpy()
        return s[mask]

    candidates = df.mapInPandas(lambda it: (local_frontier(p) for p in it), schema=schema)
    return pareto_frontier(candidates, cost_col, value_col)


def top_k_per_group(df: DataFrame, group_col: str, order_col: str, k: int, tiebreak_col: str) -> DataFrame:
    """Deterministic top-k rows per group (W7): rank by value, break ties."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def latest_per_key(df: DataFrame, key_col: str, ts_col: str, tiebreak_col: str) -> DataFrame:
    """Latest row per key (W3 cohort anchor): row_number over ts desc."""
    w = Window.partitionBy(key_col).orderBy(F.desc(ts_col), F.asc(tiebreak_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def first_nonnull_per_key(df: DataFrame, key_col: str, order_col: str, value_col: str) -> DataFrame:
    """First non-null value per key in order (W6 pick-best-across-pages)."""
    w = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        df.withColumn("picked", F.first(value_col, ignorenulls=True).over(w))
        .groupBy(key_col)
        .agg(F.first("picked").alias("picked"))
    )


def calibration_bins(df: DataFrame, prob_col: str, correct_col: str, n_bins: int = 7) -> DataFrame:
    """Reliability diagram bins (A19): bucket prob, mean accuracy per bucket."""
    bucket = F.least(F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)).cast("int")
    return (
        df.withColumn("bin", bucket)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col(prob_col)), 6).alias("mean_prob"),
            F.round(F.avg(F.col(correct_col).cast("double")), 6).alias("mean_correct"),
        )
    )


def bootstrap_median_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_resamples: int = 1000,
    seed: int = 0,
    min_n: int = 3,
) -> DataFrame:
    """Per-group median + bootstrap 95% CI (A15), deterministic.

    Reimplements the reference's cohort statistics
    (/root/reference/src/batch_doc_vqa/benchmarks/table_generator.py:838-861):
    1000 seeded resamples, CI = sorted resample medians at the 2.5/97.5
    percentile indices, CI only when n ≥ 3. Runs as ``applyInPandas`` per
    group; the RNG is seeded from (seed, group key) — never from partition or
    task ids — so results are identical under any parallelism (SURVEY.md §7.3).
    """
    schema = f"{group_col} string, n long, median double, ci_low double, ci_high double"

    def boot(key, pdf: pd.DataFrame):
        vals = [float(v) for v in pdf[value_col].dropna()]
        n, med, lo, hi = bootstrap_median_ci_kernel(str(key[0]), vals, n_resamples, seed, min_n)
        return pd.DataFrame(
            {group_col: [str(key[0])], "n": [n], "median": [med], "ci_low": [lo], "ci_high": [hi]}
        )

    return df.groupBy(group_col).applyInPandas(boot, schema=schema)


def bootstrap_median_ci_kernel(
    key: str, vals: list[float], n_resamples: int = 1000, seed: int = 0, min_n: int = 3
) -> tuple[int, float | None, float | None, float | None]:
    """Pure kernel for one group: (n, median, ci_low, ci_high).

    RNG seeded from (seed, group key) — never from partition/task ids — so the
    distributed result is a pure function of the data; the oracle embeds this
    kernel's output as SQL VALUES (kernel = oracle, the repo invariant)."""
    vals = sorted(vals)
    n = len(vals)
    med = statistics.median(vals) if n else None
    lo = hi = None
    if n >= min_n:
        h = hashlib.sha256(f"{seed}:{key}".encode()).digest()
        rng = random.Random(int.from_bytes(h[:8], "big"))
        meds = sorted(statistics.median(rng.choices(vals, k=n)) for _ in range(n_resamples))
        lo = meds[int(0.025 * n_resamples)]
        # reference convention: upper index is int(0.975*n) - 1, clamped
        hi = meds[min(n_resamples - 1, int(0.975 * n_resamples) - 1)]
    return n, med, lo, hi


def select_cohorts(
    runs: DataFrame,
    key_col: str = "model_key",
    fp_col: str = "fingerprint",
    ts_col: str = "ts",
    tiebreak_col: str = "run_name",
    window_hours: int = 24,
) -> DataFrame:
    """Latest-run-per-model cohort selection (W3).

    The newest run per key is the anchor; cohort members share the key and
    aggregation fingerprint and lie within ``window_hours`` *before* the
    anchor (/root/reference/src/batch_doc_vqa/benchmarks/cohorts.py:110-183).
    The anchor set is tiny → broadcast join; the time predicate is a range
    condition on the already-equi-joined frame (no range-join blowup).
    """
    anchors = latest_per_key(runs, key_col, ts_col, tiebreak_col).select(
        F.col(key_col), F.col(fp_col), F.col(ts_col).alias("_anchor_ts")
    )
    lag = F.col("_anchor_ts").cast("long") - F.col(ts_col).cast("long")
    return (
        runs.join(F.broadcast(anchors), [key_col, fp_col])
        .filter((lag >= 0) & (lag <= window_hours * 3600))
        .withColumn("anchor_ts", F.col("_anchor_ts"))
        .drop("_anchor_ts")
    )


def grouped_product(df: DataFrame, group_cols: list[str], prob_col: str):
    """Product aggregate per group via exp(sum(log)) (A20) with exact-zero guard."""
    has_zero = F.max((F.col(prob_col) <= 0).cast("int"))
    log_sum = F.sum(F.log(F.when(F.col(prob_col) > 0, F.col(prob_col))))
    return df.groupBy(*group_cols).agg(
        F.when(has_zero == 1, F.lit(0.0)).otherwise(F.round(F.exp(log_sum), 12)).alias("prob_product")
    )


def best_value_flags(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Flag the best value within each group (W8 best-value highlight).

    The reference bolds the best cell per metric column when rendering tables
    (table_generator.py:1594-1632); the engine form is a max-over-window flag
    — every row keeps its data plus ``is_best``. Ties all flag (the reference
    highlights every cell equal to the max).
    """
    w = Window.partitionBy(group_col)
    return df.withColumn("is_best", F.col(value_col) == F.max(value_col).over(w))
