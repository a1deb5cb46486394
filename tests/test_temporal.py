"""As-of + range join (round 6): hand-math, tie/tolerance/direction
semantics, struct row-consistency, naive-form identity, plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators.temporal import asof_join, range_join_binned


def _ts(s):
    return datetime.fromisoformat(s)


def _left(spark):
    rows = [
        (1, "a", _ts("2024-01-01 10:00:00")),
        (2, "a", _ts("2024-01-01 12:00:00")),
        (3, "a", _ts("2024-01-01 09:00:00")),  # before any right row
        (4, "b", _ts("2024-01-01 11:00:00")),
        (5, "c", _ts("2024-01-01 11:00:00")),  # key with no right rows
    ]
    return spark.createDataFrame(rows, "eid long, k string, ts timestamp")


def _right(spark):
    rows = [
        # the 10:00 tie on key a: tiebreak must pick rid=12 (larger wins);
        # rid=12 carries a NULL v — per-column last() would stitch rid=11's
        # v onto rid=12's rid, the struct must not
        (11, "a", _ts("2024-01-01 10:00:00"), 111.0),
        (12, "a", _ts("2024-01-01 10:00:00"), None),
        (10, "a", _ts("2024-01-01 09:30:00"), 100.0),
        (13, "a", _ts("2024-01-01 11:30:00"), 130.0),
        (20, "b", _ts("2024-01-01 08:00:00"), 200.0),
    ]
    return spark.createDataFrame(rows, "rid long, k string, rts timestamp, v double")


def test_asof_backward_semantics(spark):
    out = {
        r["eid"]: (r["rid"], r["v"], r["asof_ts"])
        for r in asof_join(
            _left(spark), _right(spark), ["k"], "ts", "rts",
            payload=["rid", "v"], tiebreak="rid",
        ).collect()
    }
    assert out[1] == (12, None, _ts("2024-01-01 10:00:00"))  # equal-ts match, tie -> rid 12, v stays NULL
    assert out[2] == (13, 130.0, _ts("2024-01-01 11:30:00"))
    assert out[3] == (None, None, None)  # nothing at-or-before
    assert out[4] == (20, 200.0, _ts("2024-01-01 08:00:00"))
    assert out[5] == (None, None, None)  # key with no right side

    # partition independence
    again = {
        r["eid"]: (r["rid"], r["v"], r["asof_ts"])
        for r in asof_join(
            _left(spark).repartition(5), _right(spark).repartition(3),
            ["k"], "ts", "rts", payload=["rid", "v"], tiebreak="rid",
        ).collect()
    }
    assert again == out

    plan = (
        asof_join(_left(spark), _right(spark), ["k"], "ts", "rts",
                  payload=["rid", "v"], tiebreak="rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_forward_and_tolerance(spark):
    fwd = {
        r["eid"]: r["rid"]
        for r in asof_join(
            _left(spark), _right(spark), ["k"], "ts", "rts",
            payload=["rid"], tiebreak="rid", direction="forward",
        ).collect()
    }
    # eid 1 at 10:00: earliest at-or-after is the 10:00 tie -> rid 12
    # eid 2 at 12:00: nothing after; eid 3 at 09:00 -> 09:30 row
    assert fwd[1] == 12 and fwd[2] is None and fwd[3] == 10 and fwd[4] is None

    tol = {
        r["eid"]: r["rid"]
        for r in asof_join(
            _left(spark), _right(spark), ["k"], "ts", "rts",
            payload=["rid"], tiebreak="rid", tolerance=1800,
        ).collect()
    }
    # eid 2 matched 11:30 (30 min back) -> kept; eid 4 matched 08:00 (3 h) -> nulled
    assert tol[2] == 13 and tol[4] is None and tol[1] == 12


def test_asof_input_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(_left(spark), _right(spark), ["k"], "ts", "rts", payload=["k"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(_left(spark), _right(spark), ["k"], "ts", "rts",
                  payload=["rid"], direction="nearest")


def test_range_join_matches_naive(spark):
    # overlapping, variable-length, adjacent, and empty intervals; points on
    # every boundary (start inclusive, end exclusive); with and without keys
    pts = spark.createDataFrame(
        [(i, ["x", "y"][i % 2], 1000 + 37 * i) for i in range(60)],
        "pid long, k string, p long",
    )
    ivs = spark.createDataFrame(
        [
            (0, "x", 1000, 1300), (1, "x", 1200, 1210), (2, "y", 1100, 2000),
            (3, "x", 1300, 1300),  # empty
            (4, "y", 1037, 1038),  # single-point
            (5, "x", 900, 3300),   # spans many bins
        ],
        "wid long, k string, s long, e long",
    )

    def key(rows):
        return sorted((r["pid"], r["wid"]) for r in rows)

    naive = key(
        pts.crossJoin(ivs.select(F.col("k").alias("k2"), "wid", "s", "e"))
        .filter((F.col("k") == F.col("k2")) & (F.col("s") <= F.col("p")) & (F.col("p") < F.col("e")))
        .collect()
    )
    assert naive, "fixture must produce matches"
    for bw in (64, 256, 1):
        got = key(
            range_join_binned(pts, ivs.select("wid", F.col("k").alias("_ik"), "s", "e")
                              .withColumnRenamed("_ik", "k"),
                              "p", "s", "e", bin_width=bw, on=["k"]).collect()
        )
        assert got == naive, bw
    # keyless + broadcast hint -> hash join, no nested loop
    jd = range_join_binned(pts, ivs.select("wid", "s", "e"), "p", "s", "e",
                           bin_width=128, broadcast_intervals=True)
    nokey = key(jd.collect())
    naive_nokey = key(
        pts.crossJoin(ivs.select("wid", "s", "e"))
        .filter((F.col("s") <= F.col("p")) & (F.col("p") < F.col("e"))).collect()
    )
    assert nokey == naive_nokey
    plan = jd._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_asof_tolerance_on_ntz_timestamps(spark):
    """Parquet tables carry TIMESTAMP_NTZ, which Spark 4 refuses to cast
    straight to BIGINT — the tolerance path must route through
    unix_seconds (nested-field dtype is passed explicitly)."""
    l = _left(spark).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    r = _right(spark).withColumn("rts", F.col("rts").cast("timestamp_ntz"))
    tol = {
        r2["eid"]: r2["rid"]
        for r2 in asof_join(
            l, r, ["k"], "ts", "rts", payload=["rid"], tiebreak="rid", tolerance=1800
        ).collect()
    }
    assert tol[2] == 13 and tol[4] is None and tol[1] == 12


def test_asof_null_timestamps_never_match(spark):
    """NULL left ts matches nothing in BOTH directions (the forward sort
    would otherwise see every right row); NULL right ts is unmatchable."""
    l = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00")), (2, "a", None)],
        "eid long, k string, ts timestamp",
    )
    r = spark.createDataFrame(
        [(10, "a", _ts("2024-01-01 09:00:00"), 1.0), (11, "a", None, 2.0)],
        "rid long, k string, rts timestamp, v double",
    )
    for d in ("backward", "forward"):
        got = {
            row["eid"]: row["rid"]
            for row in asof_join(l, r, ["k"], "ts", "rts",
                                 payload=["rid"], tiebreak="rid", direction=d).collect()
        }
        assert got[2] is None, d            # null left ts -> no match
        assert got[1] in (10, None), d      # null right ts never matched
    back = {
        row["eid"]: row["rid"]
        for row in asof_join(l, r, ["k"], "ts", "rts",
                             payload=["rid"], tiebreak="rid").collect()
    }
    assert back[1] == 10


def test_range_join_overwide_interval_fails_loudly(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    pts = spark.createDataFrame([(1, 500)], "pid long, p long")
    ivs = spark.createDataFrame([(0, 0, 10_000_000)], "wid long, s long, e long")
    with pytest.raises(Exception, match="interval wider"):
        try:
            range_join_binned(pts, ivs, "p", "s", "e", bin_width=1,
                              max_bins_per_interval=1000).collect()
        except Py4JJavaError as err:  # unwrap the JVM error for the match
            raise RuntimeError(str(err)) from err
    # the guard does not perturb legal results
    ok = range_join_binned(pts, ivs, "p", "s", "e", bin_width=1 << 20).collect()
    assert [(r["pid"], r["wid"]) for r in ok] == [(1, 0)]


def test_asof_array_tier_matches_window(spark):
    """strategy='array' (and 'auto' at small S) is bit-identical to the
    window tier on the hand-math fixture — including the NULL-payload tie
    row, sub-second precision, unmatched keys, both directions, tolerance —
    and on a 3000-row randomized frame with planted (key, ts) ties."""
    for direction in ("backward", "forward"):
        for tol in (None, 3600):
            kw = dict(payload=["rid", "v"], tiebreak="rid",
                      direction=direction, tolerance=tol)
            w = sorted(map(tuple, asof_join(
                _left(spark), _right(spark), ["k"], "ts", "rts", **kw).collect()))
            a = sorted(map(tuple, asof_join(
                _left(spark), _right(spark), ["k"], "ts", "rts",
                strategy="array", **kw).collect()))
            assert w == a, (direction, tol)

    left = spark.range(3000).select(
        F.col("id").alias("eid"),
        F.pmod("id", F.lit(20)).alias("k"),
        F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(1000)).alias("ts"),
    )
    right = spark.range(400).select(
        F.col("id").alias("rid"),
        F.pmod("id", F.lit(20)).alias("k"),
        F.pmod(F.col("id") * 50, F.lit(1000)).alias("rts"),  # planted ties
        (F.col("id") * 2).alias("v"),
    )
    kw = dict(payload=["rid", "v"], tiebreak="rid")
    w = sorted(map(tuple, asof_join(left, right, ["k"], "ts", "rts", **kw).collect()))
    a = sorted(map(tuple, asof_join(
        left, right, ["k"], "ts", "rts", strategy="array", **kw).collect()))
    u = sorted(map(tuple, asof_join(
        left, right, ["k"], "ts", "rts", strategy="auto", **kw).collect()))
    assert w == a == u
    assert len(w) == 3000  # left cardinality preserved exactly

    # partition independence of the array tier
    a2 = sorted(map(tuple, asof_join(
        left.repartition(7), right.repartition(3), ["k"], "ts", "rts",
        strategy="array", **kw).collect()))
    assert a2 == a


def test_asof_array_cap_and_validation(spark):
    import pytest

    left = _left(spark)
    right = _right(spark)
    with pytest.raises(ValueError, match="unknown strategy"):
        asof_join(left, right, ["k"], "ts", "rts", payload=["v"], strategy="magic")
    # a key wider than max_per_key fails loudly in-plan
    with pytest.raises(Exception, match="max_per_key"):
        asof_join(left, right, ["k"], "ts", "rts", payload=["v"],
                  strategy="array", max_per_key=2).collect()
    # auto falls back to the window tier above the cap — and still answers
    out = asof_join(left, right, ["k"], "ts", "rts", payload=["rid", "v"],
                    tiebreak="rid", strategy="auto", max_per_key=2)
    assert out.count() == 5
    # the array tier's join is a plain equi join: no BNLJ/cartesian, no Python
    plan = (
        asof_join(left, right, ["k"], "ts", "rts", payload=["rid", "v"],
                  tiebreak="rid", strategy="array")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
