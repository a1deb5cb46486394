"""Portable HLL (round 6): register hand-math vs a pure-Python recompute,
merge associativity/idempotence, accuracy vs exact distinct, linear-counting
branch, partition independence, JVM-only plan."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators.sketches import (
    hll_count_distinct,
    hll_estimate,
    hll_merge,
    hll_partial,
)

P = 8
M = 1 << P
K = 60 - P + 1


def _h(s):
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _py_registers(keys):
    regs = {}
    for key in keys:
        h = _h(key)
        b, w = h % M, h // M
        rho = (K - w.bit_length()) if w > 0 else K
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _py_estimate(regs):
    alpha = 0.7213 / (1.0 + 1.079 / M)
    s = sum(2 ** (K - r) for r in regs.values()) + (M - len(regs)) * 2**K
    raw = alpha * M * M * float(2**K) / float(s)
    zeros = M - len(regs)
    if raw <= 2.5 * M and zeros > 0:
        return round(float(M) * math.log(float(M) / zeros), 6)
    return round(raw, 6)


def test_hll_registers_match_hand_math(spark):
    rows = [(f"u{i % 700}", ["a", "b"][i % 2]) for i in range(3000)] + [(None, "a")]
    df = spark.createDataFrame(rows, "uid string, g string")
    got = {
        (r["g"], r["bucket"]): r["max_rho"]
        for r in hll_partial(df, "uid", ["g"], p=P).collect()
    }
    expect = {}
    for g in ("a", "b"):
        keys = {u for u, gg in rows if gg == g and u is not None}
        for b, r in _py_registers(keys).items():
            expect[(g, b)] = r
    assert got == expect

    est = {
        r["g"]: r["est_distinct"]
        for r in hll_count_distinct(df, "uid", ["g"], p=P).collect()
    }
    for g in ("a", "b"):
        keys = {u for u, gg in rows if gg == g and u is not None}
        assert est[g] == _py_estimate(_py_registers(keys))
        # within ~3 standard errors (1.04/sqrt(m))
        assert abs(est[g] - len(keys)) <= 3 * 1.04 / math.sqrt(M) * len(keys)

    # partition independence
    again = {
        r["g"]: r["est_distinct"]
        for r in hll_count_distinct(df.repartition(13), "uid", ["g"], p=P).collect()
    }
    assert again == est


def test_hll_merge_semantics(spark):
    rows = [(f"k{i}", "s1" if i < 400 else "s2") for i in range(1000)]
    df = spark.createDataFrame(rows, "uid string, shard string")
    # shard-wise partials (the 100 TB shape), merged to a global sketch
    parts = hll_partial(df, "uid", ["shard"], p=P).withColumn("g", F.lit("all"))
    merged = hll_merge(parts.drop("shard"), ["g"])
    direct = hll_partial(
        df.withColumn("g", F.lit("all")), "uid", ["g"], p=P
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    # idempotence: merging a shard twice changes nothing
    twice = hll_merge(parts.drop("shard").unionByName(parts.drop("shard")), ["g"])
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, merged.collect()))
    # estimate over merged partials == one-shot estimate
    a = hll_estimate(merged, ["g"], p=P).collect()[0]["est_distinct"]
    b = hll_count_distinct(df.withColumn("g", F.lit("all")), "uid", ["g"], p=P).collect()[0]["est_distinct"]
    assert a == b


def test_hll_linear_counting_branch_and_plan(spark):
    # 5 distinct keys at p=8: raw estimate far under 2.5m with empty buckets
    df = spark.createDataFrame([(f"x{i % 5}", 1) for i in range(50)], "uid string, g int")
    est = hll_count_distinct(df, "uid", ["g"], p=P).collect()[0]["est_distinct"]
    assert est == _py_estimate(_py_registers({f"x{i}" for i in range(5)}))
    assert abs(est - 5) < 0.3

    import pytest

    with pytest.raises(ValueError, match="out of range"):
        hll_partial(df, "uid", ["g"], p=2)

    plan = (
        hll_count_distinct(df, "uid", ["g"], p=P)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_hll_estimate_safe_on_unmerged_union(spark):
    """hll_estimate re-merges internally: a raw UNION of shard partials
    (duplicate buckets) must not double-count registers."""
    df = spark.createDataFrame([(f"k{i}", "g") for i in range(500)], "uid string, g string")
    part = hll_partial(df, "uid", ["g"], p=P)
    a = hll_estimate(part.unionByName(part), ["g"], p=P).collect()[0]["est_distinct"]
    b = hll_estimate(part, ["g"], p=P).collect()[0]["est_distinct"]
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="collide"):
        hll_partial(df.withColumnRenamed("g", "bucket"), "uid", ["bucket"], p=P)
