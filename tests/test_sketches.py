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


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch
# ---------------------------------------------------------------------------


def _py_bucket(x, b=5):
    tb = 1 << b
    if x < tb:
        return x
    e = x.bit_length() - 1
    return (e - b) * tb + (x >> (e - b))


def test_loghist_quantile_bounds_and_exact_small(spark):
    """The reported [q_lb, q_ub] is the exact bucket holding the type-1
    quantile value for every q and group; values < 2^b are pinned exactly."""
    import numpy as np

    from batch_doc_vqa_spark.operators.sketches import (
        loghist_partial,
        loghist_quantile,
    )

    rng = np.random.RandomState(11)
    vals = np.concatenate(
        [rng.randint(0, 32, 500), rng.geometric(0.0005, 700)]
    ).astype(int)
    rows = [(int(i), int(v), ["a", "b", "c"][i % 3]) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long, g string")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    out = loghist_quantile(loghist_partial(df, "v", ["g"], b=5), ["g"], qs, b=5)
    got = {(r["g"], r["q"]): (r["q_lb"], r["q_ub"]) for r in out.collect()}
    assert len(got) == 3 * len(qs)
    for g in ("a", "b", "c"):
        grp = np.sort(vals[np.arange(len(vals)) % 3 == {"a": 0, "b": 1, "c": 2}[g]])
        for q in qs:
            rank = math.ceil(q * len(grp))
            true = int(grp[rank - 1])
            lb, ub = got[(g, q)]
            assert lb <= true <= ub, (g, q, lb, true, ub)
            assert ub <= math.ceil(lb * (1 + 2**-5)) or lb == ub
            if true < 32:
                assert lb == true == ub  # sub-2^b values are exact


def test_loghist_merge_and_partition_independence(spark):
    """Shard partials sum to the whole-corpus sketch; results are identical
    under any input partitioning; bucket ids match the pure-Python mirror."""
    from batch_doc_vqa_spark.operators.sketches import (
        loghist_merge,
        loghist_partial,
        loghist_quantile,
    )

    rows = [(i, (i * 37) % 10_000, "g") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v long, g string")
    whole = loghist_partial(df, "v", ["g"], b=5)
    shards = loghist_partial(df.filter("id < 700"), "v", ["g"], b=5).unionByName(
        loghist_partial(df.filter("id >= 700"), "v", ["g"], b=5)
    )
    assert sorted(map(tuple, loghist_merge(shards, ["g"]).collect())) == sorted(
        map(tuple, loghist_merge(whole, ["g"]).collect())
    )
    got = {r["bucket"]: r["cnt"] for r in whole.collect()}
    expect = {}
    for _, v, _g in rows:
        expect[_py_bucket(v)] = expect.get(_py_bucket(v), 0) + 1
    assert got == expect

    q1 = sorted(map(tuple, loghist_quantile(whole, ["g"], [0.5, 0.9], b=5).collect()))
    q2 = sorted(
        map(
            tuple,
            loghist_quantile(
                loghist_partial(df.repartition(17), "v", ["g"], b=5),
                ["g"],
                [0.5, 0.9],
                b=5,
            ).collect(),
        )
    )
    assert q1 == q2


def test_loghist_guards_and_plan(spark):
    import pytest

    from batch_doc_vqa_spark.operators.sketches import (
        loghist_partial,
        loghist_quantile,
    )

    df = spark.createDataFrame([(1, "g"), (None, "g")], "v long, g string")
    # NULLs skipped, single-value corpus: every quantile is that value
    out = loghist_quantile(loghist_partial(df, "v", ["g"], b=5), ["g"], [0.5, 1.0], b=5)
    assert [(r["q_lb"], r["q_ub"]) for r in out.collect()] == [(1, 1), (1, 1)]

    with pytest.raises(ValueError, match="out of range"):
        loghist_partial(df, "v", ["g"], b=99)
    with pytest.raises(ValueError, match="collide"):
        loghist_partial(df.withColumnRenamed("g", "bucket"), "v", ["bucket"])
    with pytest.raises(ValueError, match="qs must be"):
        loghist_quantile(loghist_partial(df, "v", ["g"]), ["g"], [0.0])
    with pytest.raises(Exception, match="negative value"):
        spark.createDataFrame([(-3, "g")], "v long, g string").transform(
            lambda d: loghist_partial(d, "v", ["g"])
        ).collect()

    plan = (
        loghist_quantile(loghist_partial(df, "v", ["g"], b=5), ["g"], [0.5], b=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_overestimates_only_and_exact_when_wide(spark):
    import collections

    from batch_doc_vqa_spark.operators.sketches import cms_lookup, cms_partial

    rows = [(f"k{i % 53}", ["x", "y"][i % 2]) for i in range(800)] + [(None, "x")]
    df = spark.createDataFrame(rows, "k string, g string")
    true = collections.Counter((k, g) for k, g in rows if k is not None)

    part = cms_partial(df, "k", ["g"], w=1024, d=4)
    est = {
        (r["k"], r["g"]): r["est_count"]
        for r in cms_lookup(part, df, "k", ["g"], w=1024, d=4).collect()
    }
    assert set(est) == set(true)
    assert all(est[kg] >= c for kg, c in true.items())
    # 53 keys into 1024 buckets x 4 depths: min over depths is exact
    assert est == dict(true)

    # a tight sketch still never underestimates
    tight = cms_partial(df, "k", ["g"], w=8, d=2)
    est8 = {
        (r["k"], r["g"]): r["est_count"]
        for r in cms_lookup(tight, df, "k", ["g"], w=8, d=2).collect()
    }
    assert all(est8[kg] >= c for kg, c in true.items())

    # unseen key: every register it probes may collide, but with an empty
    # group the left join yields 0
    miss = cms_lookup(
        part,
        spark.createDataFrame([("zzz", "never")], "k string, g string"),
        "k",
        ["g"],
        w=1024,
        d=4,
    ).collect()
    assert miss[0]["est_count"] == 0


def test_cms_merge_additive_and_partition_independent(spark):
    import collections

    from batch_doc_vqa_spark.operators.sketches import (
        cms_lookup,
        cms_merge,
        cms_partial,
    )

    rows = [(i, f"u{i % 91}", "g") for i in range(1500)]
    df = spark.createDataFrame(rows, "id long, k string, g string")
    whole = cms_partial(df, "k", ["g"], w=512, d=3)
    shards = cms_partial(df.filter("id < 500"), "k", ["g"], w=512, d=3).unionByName(
        cms_partial(df.filter("id >= 500"), "k", ["g"], w=512, d=3)
    )
    assert sorted(map(tuple, cms_merge(shards, ["g"]).collect())) == sorted(
        map(tuple, cms_merge(whole, ["g"]).collect())
    )
    est = {
        r["k"]: r["est_count"]
        for r in cms_lookup(
            cms_partial(df.repartition(19), "k", ["g"], w=512, d=3),
            df,
            "k",
            ["g"],
            w=512,
            d=3,
        ).collect()
    }
    true = collections.Counter(k for _, k, _g in rows)
    assert est == dict(true)

    import pytest

    with pytest.raises(ValueError, match="bad shape"):
        cms_partial(df, "k", ["g"], w=1, d=4)
    with pytest.raises(ValueError, match="collide"):
        cms_partial(df.withColumnRenamed("g", "depth"), "k", ["depth"])

    plan = (
        cms_lookup(whole, df, "k", ["g"], w=512, d=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
