"""Training-sequence packing: concat-and-cut layout over a document stream.

The last step of a training-data pipeline lays documents end-to-end into
fixed-length context windows (GPT-2/3-style packing: concatenate the token
stream, cut every ``ctx_len`` tokens — no padding waste; a document may span
a window boundary). The layout is a pure function of (order, token counts):
every document needs its absolute start offset in the concatenated stream —
a prefix sum over the corpus.

Scale shape — distributed prefix sum, NO global single-partition sort:
``Window.orderBy(key)`` with no partitionBy collapses the corpus onto one
task. Instead the stream is cut into data-defined blocks
(``floor(key / block_size)`` — derived from the data, never from task ids,
per the determinism rule), and the offset assembles in two cheap layers:

1. per-block token totals (one map-side-combined groupBy — #blocks rows),
   cumulated by a window over the TINY block table;
2. within-block running sum (window partitioned by block — bounded state).

Both layers shuffle O(corpus) rows once on the block key; no stage sees the
whole corpus in one partition. Parameter law: choose ``block_size ≈ √N``
(N = key-domain size) so BOTH layers stay ≈ √N rows — at 10^12 docs,
block_size 10^6 gives a 10^6-row block table (16 bytes/row, one executor's
work) and 10^6-row within-block windows. The DuckDB oracle is the plain
``SUM(...) OVER (ORDER BY key)`` the distributed form must equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    ctx_len: int,
    block_size: int = 4096,
) -> DataFrame:
    """Per-document packing layout for the concat-and-cut scheme.

    ``key_col`` must be a numeric, globally-unique sort key (the stream
    order). Returns one row per input row:

    - ``start_offset``: absolute token offset where this document begins;
    - ``seq_id`` / ``end_seq_id``: first and last context window touched
      (``floor(offset / ctx_len)``);
    - ``crosses_boundary``: true when the document spans ≥2 windows.

    Documents with 0 tokens keep a defined offset (they occupy no space).
    """
    key, toks = F.col(key_col), F.col(tokens_col).cast("long")
    # exact floor-division on longs: `/` and F.floor route through double and
    # lose exactness past 2^53 (reachable with composite keys at corpus
    # scale); (key - pmod(key, b)) is an exact multiple of b, so integer
    # `div` returns the exact floor quotient for any sign
    blocked = df.withColumn(
        "_blk",
        F.expr(
            f"(CAST({key_col} AS BIGINT) - pmod(CAST({key_col} AS BIGINT), {block_size}))"
            f" div {block_size}"
        ),
    )

    block_totals = blocked.groupBy("_blk").agg(F.sum(toks).alias("_blk_tokens"))
    w_blocks = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    block_offsets = block_totals.withColumn(
        "_blk_offset", F.coalesce(F.sum("_blk_tokens").over(w_blocks), F.lit(0))
    ).drop("_blk_tokens")

    w_in_block = (
        Window.partitionBy("_blk").orderBy(key_col).rowsBetween(Window.unboundedPreceding, -1)
    )
    # window ids via the same exact-integer idiom as _blk: start_offset is a
    # corpus-wide token prefix sum and crosses 2^53 well before 10^12 docs,
    # where floor(double) would assign wrong windows to late-stream rows
    out = (
        blocked.join(F.broadcast(block_offsets), "_blk")
        .withColumn(
            "start_offset",
            F.col("_blk_offset") + F.coalesce(F.sum(toks).over(w_in_block), F.lit(0)),
        )
        .withColumn("_last", F.col("start_offset") + F.greatest(toks - F.lit(1), F.lit(0)))
        .withColumn(
            "seq_id",
            F.expr(f"(start_offset - pmod(start_offset, {ctx_len})) div {ctx_len}"),
        )
        .withColumn("end_seq_id", F.expr(f"(_last - pmod(_last, {ctx_len})) div {ctx_len}"))
        .withColumn("crosses_boundary", F.col("end_seq_id") > F.col("seq_id"))
    )
    return out.drop("_blk", "_blk_offset", "_last")


def packing_stats(packed: DataFrame, tokens_col: str, ctx_len: int) -> DataFrame:
    """One-row summary: total tokens/docs/sequences and the fill fraction of
    the final (only partially filled) window. The sequence count uses exact
    integer ceil ((total + ctx - 1) div ctx) — F.ceil(double) drifts past
    2^53; the fill ratio itself is a rounded double by nature."""
    base = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("total_tokens"),
        F.sum(F.col("crosses_boundary").cast("long")).alias("n_boundary_docs"),
    )
    return base.select(
        "n_docs",
        "total_tokens",
        F.expr(f"(total_tokens + {ctx_len - 1}) div {ctx_len}").alias("n_sequences"),
        "n_boundary_docs",
        F.round(
            F.col("total_tokens")
            / (F.expr(f"(total_tokens + {ctx_len - 1}) div {ctx_len}") * F.lit(ctx_len)),
            6,
        ).alias("fill_fraction"),
    )


def assign_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    target_tokens: int,
    seed: int = 7,
    block_size: int | None = None,
) -> DataFrame:
    """Token-balanced output-shard assignment in a deterministic
    pseudo-random order — the delivery step that turns a filtered corpus
    into the numbered shard files a training run reads.

    Every row gains:

    - ``shard_id``: ``floor(start / target_tokens)`` where ``start`` is the
      document's exclusive token prefix sum in the shuffled order — docs
      fill shard 0 until its running total crosses the target, then shard 1,
      and so on. A document is never split (shards overflow by at most one
      document, the standard first-fit contract);
    - ``shard_offset``: the document's token offset within its shard;
    - ``shard_pos``: 0-based document position within the shard (the write
      order inside the file).

    The order is the repo's deterministic draw — ``portable_hash64(id#seed)``
    with the id as tiebreak — so the global shuffle that training-data
    delivery requires (no source/time clustering inside a shard) is a pure
    function of (data, seed): reruns, resumes and any partitioning produce
    byte-identical shard manifests, and a different ``seed`` is a fresh
    epoch-level reshuffle.

    Scale shape: the prefix sum is the same two-layer distributed form as
    ``pack_sequences`` (per-block totals cumulated over a tiny block table +
    within-block running sums — never a global single-partition sort). The
    draw key is uniform on [0, 2^60), so blocks of ``block_size`` draw-space
    width hold near-equal row counts; the default carves the draw space into
    2^20 blocks (fine up to ~10^12 rows at ~10^6 rows/block; pass
    ``block_size`` to rebalance the two layers at other extremes).
    """
    from .dedup import portable_hash64

    if target_tokens < 1:
        raise ValueError(f"assign_shards: target_tokens must be >= 1: {target_tokens}")
    clash = sorted(
        {"_draw", "_blk", "_blk_offset", "_start", "shard_id", "shard_offset", "shard_pos"}
        & set(df.columns)
    )
    if clash:
        # withColumn silently REPLACES same-named columns — validate like
        # the sibling operators (retrieval._check_reserved, blocklist)
        raise ValueError(f"assign_shards: input columns collide with internals: {clash}")
    bs = int(block_size) if block_size is not None else (1 << 40)
    draw = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#{int(seed)}"))
    )
    toks = F.col(tokens_col).cast("long")
    keyed = df.withColumn("_draw", draw).withColumn(
        "_blk", F.expr(f"(_draw - pmod(_draw, {bs})) div {bs}")
    )
    block_totals = keyed.groupBy("_blk").agg(F.sum(toks).alias("_blk_tokens"))
    w_blocks = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    block_offsets = block_totals.withColumn(
        "_blk_offset", F.coalesce(F.sum("_blk_tokens").over(w_blocks), F.lit(0))
    ).drop("_blk_tokens")
    w_in_block = (
        Window.partitionBy("_blk")
        .orderBy(F.col("_draw").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    started = (
        keyed.join(F.broadcast(block_offsets), "_blk")
        .withColumn(
            "_start",
            F.col("_blk_offset") + F.coalesce(F.sum(toks).over(w_in_block), F.lit(0)),
        )
        .withColumn(
            "shard_id", F.expr(f"(_start - pmod(_start, {target_tokens})) div {target_tokens}")
        )
        .withColumn("shard_offset", F.expr(f"pmod(_start, {target_tokens})"))
    )
    w_shard = Window.partitionBy("shard_id").orderBy(
        F.col("_draw").asc(), F.col(id_col).asc()
    )
    return (
        started.withColumn("shard_pos", F.row_number().over(w_shard) - F.lit(1))
        .drop("_draw", "_blk", "_blk_offset", "_start")
    )


def shard_stats(sharded: DataFrame, tokens_col: str) -> DataFrame:
    """Per-shard balance report over ``assign_shards`` output: document and
    token totals per shard — the manifest row a delivery job commits next to
    each shard file, and the balance check (max/min shard tokens) a 10^12-row
    delivery asserts before declaring the layout healthy."""
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("shard_tokens"),
    )
