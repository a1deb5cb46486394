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
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
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
