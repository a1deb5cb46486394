"""Temporal joins Spark lacks as built-ins: as-of join and range (interval)
join — expressed as compositions of shuffle-once window/equi-join plans, so
Catalyst never falls back to a BroadcastNestedLoop/Cartesian range join and
there is no per-row Python anywhere.

Why these exist here: a crawl table keyed by (url, warc_ts) constantly needs
"the latest snapshot at-or-before t" (as-of) and "which maintenance/crawl
window does this event fall in" (point-in-interval). Spark's only native
answers are a SQL range join (nested-loop at worst) or mapInPandas over
``pandas.merge_asof`` (Python on the hot path, and only correct after a
global sort). Both operators below are pure DataFrame compositions.

Determinism contract: results are pure functions of the data — the as-of
window's sort is made total with an explicit right-side tiebreak column, and
the range join's bin ids derive from integer epoch math, never from
partitioning (CLAUDE.md north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("_ts", "_side", "_rpay", "_tb", "_m", "_mts", "_arr", "_lk", "_m0", "_fk", "_k", "_guard")


def _epoch_seconds(df: DataFrame, col: str, dtype: str | None = None):
    """Truncated epoch seconds for numeric OR timestamp columns. Spark 4
    forbids the direct TIMESTAMP_NTZ→BIGINT cast, and the session tz is
    pinned UTC (session.py), so NTZ→LTZ→unix_seconds is unambiguous;
    unix_seconds truncates sub-second precision — the same floor the
    DuckDB mirror writes as CAST(floor(epoch(ts)) AS BIGINT). Pass
    ``dtype`` explicitly for nested fields (df.dtypes only lists
    top-level columns)."""
    dt = dtype if dtype is not None else dict(df.dtypes).get(col, "")
    if dt.startswith("timestamp"):
        return F.unix_seconds(F.col(col).cast("timestamp"))
    return F.col(col).cast("long")


def _bin_of(epoch_col, bin_width: int):
    """floor(epoch / width) in exact integer math (subtract the
    non-negative pmod, divide the exact multiple — the budget_select
    pattern; a double-routed floor could mis-bin at a last-ulp boundary)."""
    w = F.lit(int(bin_width))
    return ((epoch_col - F.pmod(epoch_col, w)) / w).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    tiebreak: str | None = None,
    matched_ts: str = "asof_ts",
    strategy: str = "window",
    max_per_key: int = 4096,
) -> DataFrame:
    """Left as-of join: every left row gains the ``payload`` columns of the
    single right row sharing its ``on`` keys whose ``right_ts`` is the
    latest at-or-before ``left_ts`` (``direction='backward'``, the
    pandas.merge_asof default) or the earliest at-or-after it
    (``'forward'``). Unmatched left rows keep NULL payload (left-outer
    semantics); ``matched_ts`` carries the matched right timestamp.

    Plan shape — the scale answer to a range join: both sides shuffle ONCE
    on the ``on`` keys into a single union, and one running
    ``last(payload_struct, ignorenulls=True)`` window pass computes every
    match — cost O(n log n) per key group, no candidate explosion, no
    BroadcastNestedLoop. Payload columns ride in ONE struct so every
    attached column provably comes from the SAME right row (per-column
    ``last(ignorenulls)`` could stitch different rows when payload fields
    are themselves NULL).

    Determinism: the window sort is (ts, side, tiebreak) — pass
    ``tiebreak`` (a right column, e.g. its primary key; larger wins) when
    right rows can tie on (keys, ts), otherwise the tied pick would be
    sort-order-dependent. Equal timestamps match (right sorts before left
    at the same ts, both directions). ``tolerance`` (seconds, compared on
    truncated epoch seconds) NULLs out matches farther than the bound.

    At 10^12-row scale: partitioning is by ``on`` — fine-grained keys
    (url, user) spread evenly; a single mega-key serializes its own group
    only. Salting cannot apply here (a salted key would split the
    timeline), so skewed keys should be pre-filtered or handled upstream.

    ``strategy``: ``'window'`` (above — any snapshots-per-key, two sorts);
    ``'array'`` — the right side collapses to ONE row per key holding its
    sorted timeline (collect_list → sort_array), the join becomes a plain
    equi join (AQE broadcasts it when keys are few: the EVENT side then
    never shuffles at all), and each match is an in-plan array probe —
    O(S) per left row, so it wins exactly when snapshots-per-key S is
    small — `scripts/asof_scale_probe.py --array`: 2.2× faster at S=100
    (7.3 s vs 15.9 s, 2M events × 1M snapshots), par at S=1000. A key
    exceeding
    ``max_per_key`` fails LOUDLY in-plan rather than silently building a
    giant row; payload types must be orderable (they ride in the sorted
    struct). ``'auto'`` measures max snapshots-per-key (one tiny aggregate
    job on the right) and picks array iff it fits. Both tiers return
    bit-identical rows — tier invariance is oracle-checked
    (`events_asof_order_array` shares `events_asof_order`'s SQL oracle).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if strategy not in ("window", "array", "auto"):
        raise ValueError(f"asof_join: unknown strategy {strategy!r}")
    clash = [c for c in (*payload, matched_ts) if c in left.columns]
    if clash:
        raise ValueError(f"asof_join: payload/matched_ts collide with left columns: {clash}")
    reserved = [c for c in (*left.columns, *right.columns) if c in _RESERVED]
    if reserved:
        raise ValueError(f"asof_join: reserved column names in inputs: {reserved}")

    # NULL timestamps are ill-defined for as-of semantics: a NULL right ts
    # must never be matchable, and a NULL left ts must match nothing (in
    # the forward sort it would otherwise see every right row).
    right = right.filter(F.col(right_ts).isNotNull())

    if strategy == "auto":
        mx = right.groupBy(*on).count().agg(F.max("count")).collect()[0][0]
        strategy = "array" if (mx or 0) <= max_per_key else "window"
    if strategy == "array":
        return _asof_array(
            left, right, on, left_ts, right_ts, payload, direction,
            tolerance, tiebreak, matched_ts, max_per_key,
        )

    rpay = F.struct(F.col(right_ts).alias("_mts"), *[F.col(c) for c in payload])
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        rpay.alias("_rpay"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        F.lit(0).alias("_side"),
    )
    l = left.select("*", F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"))
    u = l.unionByName(r, allowMissingColumns=True)

    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.withColumn(
            "_m",
            F.when(
                F.col("_ts").isNotNull(),
                F.last("_rpay", ignorenulls=True).over(w),
            ),
        )
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        lt_dtype = dict(left.dtypes)[left_ts]
        rt_dtype = dict(right.dtypes)[right_ts]
        dt = F.abs(
            _epoch_seconds(out, "_ts", lt_dtype)
            - _epoch_seconds(out, "_m._mts", rt_dtype)
        )
        out = out.withColumn("_m", F.when(dt <= tolerance, F.col("_m")))
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("_m._mts").alias(matched_ts),
        *[F.col(f"_m.{c}").alias(c) for c in payload],
    )


def _asof_array(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str,
    tolerance: int | None,
    tiebreak: str | None,
    matched_ts: str,
    max_per_key: int,
) -> DataFrame:
    """asof_join's small-timeline tier: per-key sorted struct arrays + an
    equi join + in-plan array probes (see asof_join docstring). The match
    compares the RAW timestamp values (same precision as the window tier's
    union sort — truncated epochs would flip sub-second matches), and ties
    on (ts) resolve to the largest ``tiebreak`` exactly like the window's
    (ts, side, tb) running-last. HOF discipline (CLAUDE.md): every lambda
    takes one arg and references only projected columns (_lk, _m0, _fk)."""
    elem = F.struct(
        F.col(right_ts).alias("_k"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        F.col(right_ts).alias("_mts"),
        *[F.col(c) for c in payload],
    )
    arr = right.groupBy(*on).agg(
        F.sort_array(F.collect_list(elem)).alias("_arr")
    )
    # fail-loud cap: a key wider than max_per_key means this tier was the
    # wrong call — the guard column is data-dependent (not foldable) and
    # the filter forces its evaluation
    arr = arr.withColumn(
        "_guard",
        F.when(F.size("_arr") <= max_per_key, F.lit(0)).otherwise(
            F.raise_error(
                f"asof_join(strategy='array'): a key exceeds max_per_key="
                f"{max_per_key} right rows; use strategy='window'"
            ).cast("int")
        ),
    ).filter(F.col("_guard") == 0).drop("_guard")

    l = left.withColumn("_lk", F.col(left_ts))
    j = l.join(arr, on, "left")
    if direction == "backward":
        # sorted ascending by (_k, _tb): the LAST element at-or-before _lk
        # is the latest ts, largest tiebreak
        j = j.withColumn(
            "_m0", F.filter("_arr", lambda e: e["_k"] <= F.col("_lk"))
        )
        m = F.try_element_at("_m0", F.lit(-1))
    else:
        # forward: first element at-or-after _lk has the minimal ts; among
        # equal ts the window tier picks the largest tiebreak, so step to
        # the LAST element sharing that ts
        j = j.withColumn(
            "_m0", F.filter("_arr", lambda e: e["_k"] >= F.col("_lk"))
        ).withColumn("_fk", F.try_element_at("_m0", F.lit(1))["_k"])
        m = F.try_element_at(
            F.filter("_m0", lambda e: e["_k"] == F.col("_fk")), F.lit(-1)
        )
    out = j.withColumn("_m", m)
    if tolerance is not None:
        lt_dtype = dict(left.dtypes)[left_ts]
        rt_dtype = dict(right.dtypes)[right_ts]
        dt = F.abs(
            _epoch_seconds(out, "_lk", lt_dtype)
            - _epoch_seconds(out, "_m._mts", rt_dtype)
        )
        out = out.withColumn("_m", F.when(dt <= tolerance, F.col("_m")))
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("_m._mts").alias(matched_ts),
        *[F.col(f"_m.{c}").alias(c) for c in payload],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    on: list[str] | None = None,
    broadcast_intervals: bool = False,
    max_bins_per_interval: int = 65536,
) -> DataFrame:
    """Inner point-in-interval join (``start <= point < end``, plus
    equality on ``on``) as an EQUI join: intervals explode into the
    fixed-width epoch bins they cover, points carry their single bin id,
    and the (keys, bin) hash join + exact containment filter reproduces
    the range predicate with zero nested-loop risk. Each qualifying
    (point, interval) pair matches in exactly ONE bin — the point's — so
    no dedup pass is needed.

    Bin math is integer-only on truncated epoch seconds (``cast(ts as
    long)`` truncation, ``div`` flooring — positive epochs assumed):
    deterministic and identical for the point and interval sides by
    construction. Pick ``bin_width`` near the typical interval length: the
    explode factor is ``len/bin_width + 1`` per interval, the per-bin
    candidate count is what the post-join filter prunes. Overlapping and
    variable-length intervals are fine — that's the case a window
    aggregate can't express.

    ``broadcast_intervals=True`` hints the exploded interval side (the
    usual small dimension — maintenance windows, crawl epochs); leave
    False for interval tables big enough to need the shuffle, where AQE
    decides. An interval wider than ``max_bins_per_interval`` bins fails
    LOUDLY (raise_error in-plan) instead of silently exploding a task —
    raise the cap or the bin width deliberately, not by accident.
    """
    on = on or []
    clash = [c for c in (*points.columns, *intervals.columns) if c == "_pbin"]
    if clash:
        raise ValueError("range_join_binned: inputs must not contain '_pbin'")
    p = points.withColumn("_pbin", _bin_of(_epoch_seconds(points, point_col), bin_width))
    b_lo = _bin_of(_epoch_seconds(intervals, start_col), bin_width)
    b_hi = _bin_of(_epoch_seconds(intervals, end_col) - 1, bin_width)
    guarded_hi = F.when(
        b_hi - b_lo < F.lit(int(max_bins_per_interval)),
        b_hi,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join_binned: interval wider than {max_bins_per_interval} "
                    f"bins at bin_width={bin_width}; widen bin_width or raise "
                    "max_bins_per_interval"
                )
            )
        ).cast("long")
    )
    iv = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn("_pbin", F.explode(F.sequence(b_lo, guarded_hi)))
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = _epoch_seconds(points, point_col)
    s = _epoch_seconds(intervals, start_col)
    e = _epoch_seconds(intervals, end_col)
    return p.join(iv, [*on, "_pbin"]).filter((s <= pt) & (pt < e)).drop("_pbin")
