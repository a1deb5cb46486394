"""PageRank (round 6): pure-Python mirror hand-math (same round-12 decimal
fold), dangling redistribution, mass conservation, partition independence,
multi-edge collapse, validation, JVM-only plan."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from batch_doc_vqa_spark.operators.graphs import pagerank

# a -> b, a -> c, b -> c, d dangling (in-link only), c -> a
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d")]


def _rnd(x: float, r: int) -> float:
    # Spark's round(double, r) goes through BigDecimal.valueOf ==
    # Double.toString == the SHORTEST round-trip decimal (Python repr), then
    # HALF_UP — NOT the exact binary expansion, and not Python's banker's
    # round. Both alternatives disagree on .5-at-digit-13 boundaries.
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-r), rounding=ROUND_HALF_UP)
    )


def _py_pagerank(edges, iterations=4, d=0.85, r=12):
    nodes = sorted({x for e in edges for x in e})
    n = float(len(nodes))
    deg = {}
    for s, _ in set(edges):
        deg[s] = deg.get(s, 0) + 1
    q = Decimal(1).scaleb(-r)
    ranks = {v: _rnd(1.0 / n, r) for v in nodes}
    for _ in range(iterations):
        sums = {v: Decimal(0) for v in nodes}
        for s, t in set(edges):
            sums[t] += Decimal(str(_rnd(ranks[s] / deg[s], r))).quantize(q)
        dang = sum(
            (Decimal(str(_rnd(ranks[v], r))).quantize(q) for v in nodes if v not in deg),
            Decimal(0),
        )
        ranks = {
            v: _rnd((1.0 - d) / n + d * (float(sums[v]) + float(dang) / n), r)
            for v in nodes
        }
    return ranks


def test_pagerank_hand_math_and_mass(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}
    assert got == _py_pagerank(EDGES)
    # dangling mass is redistributed: total stays ~1 (rounding drift only)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the sink 'd' has rank, the hub 'c' outranks it
    assert got["c"] > got["d"] > 0


def test_pagerank_partition_independence_and_multiedge(spark):
    df = spark.createDataFrame(EDGES * 3, "src string, dst string")  # dup edges
    base = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    assert base == _py_pagerank(EDGES, iterations=3)  # multi-edges count once
    again = {
        r["node"]: r["rank"]
        for r in pagerank(df.repartition(13), iterations=3, checkpoint=False).collect()
    }
    assert again == base


def test_pagerank_validation_and_plan(spark):
    import pytest

    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError, match="collide"):
        pagerank(df.withColumnRenamed("src", "rank"), src="rank")

    plan = (
        pagerank(df, iterations=2, checkpoint=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
