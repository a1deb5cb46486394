"""Seeded run/lineage metadata fixture (FIXTURES.md F6) + extraction-result
rows fixture (F4).

Shapes mirror the reference's run store
(/root/reference/src/batch_doc_vqa/core/run_manager.py:264-312), cohort fields
(benchmarks/cohorts.py:24-93), per-image timing/token metadata
(openrouter/inference.py:1199-1238) and the failure-marker taxonomy
(openrouter/param_sweep.py:47-56). Deterministic per (seed, i) like the pages
generator: rows cover every cost-status class (precise / estimated / missing /
zero) and every failure marker so the cost-lattice and failure-rollup
operators have all branches exercised.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

_BASE = _dt.datetime(2025, 6, 1, 12, 0, 0)

MODELS = ["org-a/model-x", "org-a/model-y", "org-b/model-z", "org-c/tiny-1"]
FAILURE_MARKERS = ["", "", "", "", "_schema_failed", "_request_failed", "_parse_failed", "_empty_response"]

RUNS_SCHEMA = (
    "run_name string, model_key string, ts timestamp, fingerprint string, "
    "runtime_seconds double, digit_top1 double, id_top1 double, docs_detected double"
)

RESULTS_SCHEMA = (
    "run_name string, url string, prompt_tokens long, completion_tokens long, "
    "actual_cost double, cost_is_estimated boolean, generation_id string, "
    "failure_marker string, elapsed_seconds double"
)


def _rng(seed: int, tag: str, i: int) -> random.Random:
    h = hashlib.sha256(f"{tag}:{seed}:{i}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def runs_rows(n_runs: int = 24, seed: int = 42) -> list[tuple]:
    rows = []
    for i in range(n_runs):
        rng = _rng(seed, "run", i)
        model = MODELS[i % len(MODELS)]
        # runs cluster inside/outside a 24h window per model
        hours_back = rng.choice([0, 2, 5, 12, 20, 30, 50])
        ts = _BASE - _dt.timedelta(hours=hours_back, minutes=i)
        fp = "fp-" + ("main" if rng.random() < 0.8 else "alt")
        rows.append(
            (
                f"run_{i:03d}",
                model,
                ts,
                fp,
                round(30 + 200 * rng.random(), 3),
                round(70 + 30 * rng.random(), 4),
                round(60 + 40 * rng.random(), 4),
                round(80 + 20 * rng.random(), 4),
            )
        )
    return rows


def result_rows(n_runs: int = 6, per_run: int = 32, seed: int = 42) -> list[tuple]:
    """Per-(run, url) result metadata covering all cost classes & markers."""
    rows = []
    for r in range(n_runs):
        for i in range(per_run):
            rng = _rng(seed, f"res{r}", i)
            cost_class = rng.choice(["precise", "precise", "estimated", "pending", "missing", "zero"])
            if cost_class == "precise":
                cost, est, gen = round(rng.uniform(1e-5, 1e-3), 8), False, f"gen-{r}-{i}"
            elif cost_class == "estimated":
                cost, est, gen = round(rng.uniform(1e-5, 1e-3), 8), True, f"gen-{r}-{i}"
            elif cost_class == "zero":
                cost, est, gen = 0.0, False, f"gen-{r}-{i}"
            elif cost_class == "pending":
                # generation recorded but cost not yet fetched → backfill candidate
                cost, est, gen = None, False, f"gen-{r}-{i}"
            else:
                cost, est, gen = None, False, None
            marker = rng.choice(FAILURE_MARKERS)
            elapsed = round(rng.uniform(0.5, 20.0), 3) if rng.random() < 0.95 else None
            rows.append(
                (
                    f"run_{r:03d}",
                    f"https://site{i % 5:02d}.example.org/doc-{i}",
                    rng.randint(200, 2000),
                    rng.randint(50, 500),
                    cost,
                    est,
                    gen,
                    marker,
                    elapsed,
                )
            )
    return rows


def runs_df(spark: SparkSession, n_runs: int = 24, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(runs_rows(n_runs, seed), RUNS_SCHEMA)


def results_df(spark: SparkSession, n_runs: int = 6, per_run: int = 32, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(result_rows(n_runs, per_run, seed), RESULTS_SCHEMA)
