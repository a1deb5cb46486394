"""Run-level rollups: token/cost aggregation, cost-status lattice, runtime.

DataFrame re-expressions of the reference's run accounting:
- token/cost rollup — /root/reference/src/batch_doc_vqa/benchmarks/
  table_generator.py:1485-1592 (`_calculate_actual_costs`) and
  openrouter/param_sweep.py:226-312;
- cost-status lattice — table_generator.py:903-965: a run's total cost is
  NULL unless every row has a cost (never mix partial totals with complete
  ones); status ∈ unavailable/partial/estimated/verified_zero/precise;
- "fully parallelizable runtime" — table_generator.py:1444-1483: max
  per-row elapsed, only when *all* rows carry timing;
- failure classification counts — openrouter/inference.py:1071-1097.

Single ``agg`` per run with conditional sums — one shuffle on run_name, no
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cost_rollup(results: DataFrame, run_col: str = "run_name") -> DataFrame:
    """Per-run token totals + cost lattice (A6 + A16)."""
    cost = F.col("actual_cost")
    est = F.col("cost_is_estimated")
    per_run = results.groupBy(run_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("prompt_tokens").alias("prompt_tokens"),
        F.sum("completion_tokens").alias("completion_tokens"),
        F.sum(cost.isNull().cast("long")).alias("n_missing"),
        F.sum((cost.isNotNull() & est).cast("long")).alias("n_estimated"),
        F.sum((cost.isNotNull() & ~est & (cost == 0)).cast("long")).alias("n_zero"),
        F.sum((cost.isNotNull() & ~est & (cost > 0)).cast("long")).alias("n_precise"),
        F.sum(cost).alias("_cost_sum"),
    )
    complete = F.col("n_missing") == 0
    status = (
        F.when(F.col("n_missing") == F.col("n_rows"), "unavailable")
        .when(~complete, "partial")
        .when(F.col("n_estimated") > 0, "estimated")
        .when(F.col("n_zero") == F.col("n_rows"), "verified_zero")
        .otherwise("precise")
    )
    return per_run.select(
        run_col,
        "n_rows",
        "prompt_tokens",
        "completion_tokens",
        "n_missing",
        "n_estimated",
        "n_zero",
        "n_precise",
        status.alias("cost_status"),
        # lattice invariant: no total unless complete
        F.when(complete, F.round(F.col("_cost_sum"), 8)).alias("total_cost"),
        F.when(complete, F.round(F.col("_cost_sum") / F.col("n_rows"), 10)).alias("cost_per_row"),
    )


def parallel_runtime(results: DataFrame, run_col: str = "run_name") -> DataFrame:
    """Max per-row elapsed, NULL unless timing coverage is 100% (A7)."""
    agg = results.groupBy(run_col).agg(
        F.max("elapsed_seconds").alias("_max_elapsed"),
        F.sum(F.col("elapsed_seconds").isNull().cast("long")).alias("n_untimed"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return agg.select(
        run_col,
        "n_rows",
        "n_untimed",
        F.when(F.col("n_untimed") == 0, F.col("_max_elapsed")).alias("parallel_runtime_seconds"),
    )


def failure_counts(results: DataFrame, run_col: str = "run_name") -> DataFrame:
    """Failure-reason counts per run (A22); empty marker → 'ok'."""
    reason = F.when(F.col("failure_marker") == "", "ok").otherwise(F.col("failure_marker"))
    return results.groupBy(run_col, reason.alias("reason")).agg(F.count(F.lit(1)).alias("n"))
