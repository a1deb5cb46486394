"""Portable distinct-count sketches: a deterministic, cross-engine-exact
HyperLogLog over the repo's md5 hash.

Why not ``approx_count_distinct``: Spark's HLL++ is a JVM black box — its
registers can't be recomputed by another engine, so a DuckDB oracle can't
verify it and a resumed/partially-recomputed pipeline can't check a sketch
against its inputs. This HLL derives every register from
``portable_hash64`` (first 15 md5 hex chars — the repo-wide hash), making
the WHOLE sketch a pure function of the data: same estimate under any
partitioning, any engine, any merge order.

Numeric discipline (CLAUDE.md): rho comes from the LENGTH OF THE BINARY
STRING of the suffix bits (``conv(w, 10, 2)`` / DuckDB ``bin``) — integer
exact, no float log2 whose last-ulp could flip a register at a power-of-two
boundary. Register sums use decimal(38,0) over integer powers of two
(order-free; a double fold of 2^-M_j terms loses bits once the spread
passes 53). Only the final estimate (and the linear-counting ln) round to
6 as doubles, written identically in SQL.

Scale shape: ``hll_partial`` is one map-side projection + one (groups,
bucket) aggregate — the per-shard/per-day sketch a 10^12-row pipeline
actually materializes (m=2^p longs per group, KBs). ``hll_merge`` is a
max-aggregate over partials (associative + commutative + idempotent —
re-merging a shard is harmless). ``hll_estimate`` reduces m rows per group
to the final number. The corpus is scanned exactly once, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 md5 hex chars


def _alpha(m: int) -> float:
    # The general Flajolet formula for EVERY m — deliberately including the
    # small-m sizes where the paper tabulates constants (0.673/0.697/0.709):
    # the SQL oracles embed 0.7213/(1 + 1.079/m) verbatim, and the kernel =
    # oracle rule wins over the tabulated rounding. (r7: the old special
    # cases diverged from the oracle by ~0.05% on any fixture large enough
    # to take the raw-estimate branch — registers were identical, the
    # estimate was not.)
    return 0.7213 / (1.0 + 1.079 / m)


def hll_partial(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 12
) -> DataFrame:
    """(groups..., bucket, max_rho): the mergeable per-group HLL registers.
    bucket = low ``p`` hash bits; rho = leading-zero count of the remaining
    ``60-p`` bits plus one (via binary-string length — integer exact).
    NULL keys are skipped (COUNT DISTINCT semantics). Only non-empty
    registers are emitted; absent buckets mean rho 0."""
    if not 4 <= p <= 18:
        raise ValueError(f"hll_partial: p={p} out of range [4, 18]")
    clash = [c for c in group_cols if c in ("bucket", "rho", "max_rho", "_h")]
    if clash:
        raise ValueError(f"hll_partial: group_cols collide with internals: {clash}")
    from .dedup import portable_hash64

    m = 1 << p
    base = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols,
        portable_hash64(F.col(key_col).cast("string")).alias("_h"),
    )
    # _h div m must be TRUE integer division: _h can exceed 2^53, so a
    # double-routed floor(h/m) is inexact near power-of-two boundaries
    w = F.expr(f"_h div {m}")
    msb = F.length(F.conv(w.cast("string"), 10, 2))  # floor(log2 w) + 1 for w > 0
    rho = F.when(w > 0, F.lit(_HASH_BITS - p + 1) - msb).otherwise(
        F.lit(_HASH_BITS - p + 1)
    )
    return (
        base.select(
            *group_cols,
            F.pmod(F.col("_h"), F.lit(m)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union-of-sets merge: max per (groups, bucket). Associative,
    commutative, idempotent — shards/days/reruns merge in any order."""
    return partials.groupBy(*group_cols, "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(
    partials: DataFrame, group_cols: list[str], p: int = 12
) -> DataFrame:
    """(groups..., est_distinct): the HLL estimate with the standard
    small-range (linear counting) correction. The register sum is exact:
    sum of 2^(K - max_rho) as decimal(38,0) with K = 61-p, so the double
    division happens once on exact operands; empty buckets contribute
    2^K each (m - observed of them). Partials are re-merged first (a
    near-free max over register-scale rows), so a raw UNION of shard
    partials is safe input — duplicate buckets can never double-count."""
    m = 1 << p
    k = _HASH_BITS - p + 1  # max rho
    alpha = _alpha(m)
    partials = hll_merge(partials, group_cols)
    agg = partials.groupBy(*group_cols).agg(
        F.sum(
            F.pow(F.lit(2.0), (F.lit(k) - F.col("max_rho"))).cast("decimal(38,0)")
        ).alias("_s_obs"),
        F.count(F.lit(1)).alias("_nbuckets"),
    )
    # absent buckets: rho 0 → term 2^K each
    s_full = (
        F.col("_s_obs").cast("double")
        + (F.lit(m) - F.col("_nbuckets")).cast("double") * F.lit(float(2**k))
    )
    raw = F.lit(alpha * m * m * float(2**k)) / s_full
    zeros = F.lit(m) - F.col("_nbuckets")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias("est_distinct"))


def hll_count_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 12
) -> DataFrame:
    """One-shot convenience: partial → estimate (single scan, one shuffle
    to (groups, bucket), one tiny rollup to groups)."""
    return hll_estimate(hll_partial(df, key_col, group_cols, p), group_cols, p)


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch (HDR-histogram bucketing: exponent + top-b
# mantissa bits). The 10^12-row percentile answer: a few-KB mergeable count
# table per group, INTEGER-exact bucket math (msb via binary-string length,
# the same trick as rho above — no float log whose last ulp could flip a
# bucket between engines), so the whole sketch is a pure function of the
# data. Guarantees: the reported [q_lb, q_ub] is the exact bucket holding
# the rank-ceil(q·n) value, ub/lb ≤ 1 + 2^-b (values < 2^b are EXACT).
# Spark's percentile_approx (KLL-ish) is compaction-order-dependent and
# engine-opaque; this sketch merges shards/days/reruns by plain count
# addition and re-verifies in SQL.
# ---------------------------------------------------------------------------


def _loghist_bucket(v, b: int):
    """Monotone bucket id for a non-negative long ``v``: identity below
    2^b; otherwise (e-b)·2^b + (v div 2^(e-b)) with e = floor(log2 v).
    Integer-only: msb position = length(bin(v)), power of two via
    shiftleft — both exact and identical in DuckDB (bin / <<)."""
    tb = 1 << b
    shift = F.length(F.bin(v)) - F.lit(1 + b)  # e - b
    pow2 = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), length(bin(_v)) - {1 + b})"
    )
    sub = F.expr("_v div _p2")
    return pow2, F.when(v < tb, v).otherwise(shift * tb + sub)


def loghist_partial(
    df: DataFrame, value_col: str, group_cols: list[str], b: int = 5
) -> DataFrame:
    """(groups..., bucket, cnt): mergeable per-group log-histogram counts
    of a non-negative integer metric (token counts, doc lengths, latency
    ms). One projection + one map-side-combinable shuffle; at most
    (63-b)·2^b + 2^b bucket rows per group (b=5 → ≤ 1.9k rows), whatever
    the corpus size. Negative values raise (fail-loud); NULLs are skipped."""
    if not 0 <= b <= 16:
        raise ValueError(f"loghist_partial: b={b} out of range [0, 16]")
    clash = [c for c in group_cols if c in ("bucket", "cnt", "_v", "_p2")]
    if clash:
        raise ValueError(f"loghist_partial: group_cols collide: {clash}")
    guarded = F.when(
        F.col(value_col) < 0,
        F.raise_error(f"loghist_partial: negative value in {value_col}"),
    ).otherwise(F.col(value_col).cast("long"))
    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, guarded.alias("_v")
    )
    pow2, _ = _loghist_bucket(F.col("_v"), b)
    base = base.withColumn("_p2", pow2)
    _, bucket = _loghist_bucket(F.col("_v"), b)
    return (
        base.select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def loghist_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Shard/day/rerun merge: plain count addition per (groups, bucket) —
    associative + commutative (NOT idempotent: a shard merges once; the
    epoch-marker protocol provides exactly-once where replays exist)."""
    return partials.groupBy(*group_cols, "bucket").agg(F.sum("cnt").alias("cnt"))


def loghist_quantile(
    partials: DataFrame, group_cols: list[str], qs: list[float], b: int = 5
) -> DataFrame:
    """(groups..., q, q_lb, q_ub): for each q in (0, 1], the EXACT bucket
    bounds around the rank-ceil(q·n) smallest value (type-1 quantile).
    Runs entirely on the bucket table (≤ ~2k rows per group): two windows
    + an explode of the q literals — never touches the corpus. The rank
    compare is an integer compare; ceil(q·n) is the one double op, written
    identically in the SQL oracle."""
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"loghist_quantile: qs must be in (0, 1]: {qs}")
    from pyspark.sql.window import Window

    tb = 1 << b
    merged = loghist_merge(partials, group_cols)
    part = list(group_cols) if group_cols else [F.lit(1)]
    w_cum = (
        Window.partitionBy(*part)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part)
    cum = merged.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(w_cum).alias("_cum"),
        F.sum("cnt").over(w_all).alias("_n"),
    )
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in sorted(qs)])).alias("q")
    hits = (
        cum.select(*group_cols, "bucket", "_cum", "_n", qcol)
        .filter(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
        .groupBy(*group_cols, "q")
        .agg(F.min("bucket").alias("_bkt"))
    )
    shift = F.expr(f"_bkt div {tb}") - F.lit(1)  # e - b of the bucket
    sub = F.col("_bkt") - shift * tb
    width = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bkt div {tb} AS INT) - 1)")
    lb = F.when(F.col("_bkt") < tb, F.col("_bkt")).otherwise(sub * width)
    ub = F.when(F.col("_bkt") < tb, F.col("_bkt")).otherwise(
        sub * width + width - 1
    )
    return hits.select(
        *group_cols, "q", lb.cast("long").alias("q_lb"), ub.cast("long").alias("q_ub")
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency registers. The 100 TB use case is
# HISTORY — per-day/per-shard register tables of d·w longs answer "how
# often did this url/host/n-gram appear, ever" by register addition,
# without re-scanning a byte of raw data. Estimates are upward-biased only
# (est ≥ true; E[err] ≤ 2n/w per depth, min over d depths). Registers
# derive from the repo's md5 hash with the depth as an explicit salt, so
# the whole sketch — and any point lookup — re-verifies in SQL.
# ---------------------------------------------------------------------------


def cms_partial(
    df: DataFrame, key_col: str, group_cols: list[str], w: int = 1024, d: int = 4
) -> DataFrame:
    """(groups..., depth, bucket, cnt): one corpus scan, a d-way posexplode
    (constant fan-out), one map-side-combinable shuffle to at most d·w
    register rows per group. NULL keys are skipped."""
    if w < 2 or d < 1 or d > 16:
        raise ValueError(f"cms_partial: bad shape w={w}, d={d}")
    clash = [c for c in group_cols if c in ("depth", "bucket", "cnt", "_k")]
    if clash:
        raise ValueError(f"cms_partial: group_cols collide: {clash}")
    from .dedup import portable_hash64

    base = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols, F.col(key_col).cast("string").alias("_k")
    )
    buckets = F.array(
        *[
            F.pmod(
                portable_hash64(F.concat(F.col("_k"), F.lit(f"\x1f{i}"))), F.lit(w)
            )
            for i in range(d)
        ]
    )
    return (
        base.select(*group_cols, F.posexplode(buckets).alias("depth", "bucket"))
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Register addition per (groups, depth, bucket) — associative +
    commutative (not idempotent; exactly-once comes from the epoch-marker
    protocol where replays exist)."""
    return partials.groupBy(*group_cols, "depth", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    partials: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str],
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """(groups..., key_col, est_count): point-frequency estimates for a
    keys frame carrying the same group columns. Each key fans out to its d
    registers, LEFT-joins the register table on (groups, depth, bucket) —
    a hash equi-join, register side ≤ d·w rows per group — and takes the
    min (absent register → 0). est_count ≥ true count always."""
    from .dedup import portable_hash64

    probes = (
        keys.filter(F.col(key_col).isNotNull())
        .select(*group_cols, F.col(key_col).cast("string").alias("_k"))
        .distinct()
    )
    buckets = F.array(
        *[
            F.pmod(
                portable_hash64(F.concat(F.col("_k"), F.lit(f"\x1f{i}"))), F.lit(w)
            )
            for i in range(d)
        ]
    )
    fan = probes.select(
        *group_cols, "_k", F.posexplode(buckets).alias("depth", "bucket")
    )
    merged = cms_merge(partials, group_cols)
    est = (
        fan.join(merged, [*group_cols, "depth", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(*group_cols, "_k")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.withColumnRenamed("_k", key_col)
