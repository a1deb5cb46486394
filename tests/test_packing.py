"""Sequence packing (concat-and-cut): the distributed two-layer prefix sum
must equal the naive sequential layout under any blocking/partitioning."""

from __future__ import annotations

import random

from batch_doc_vqa_spark.operators.packing import pack_sequences, packing_stats

CTX = 100


def _naive_layout(rows):
    out, off = {}, 0
    for k, n in sorted(rows):
        start = off
        end_seq = (start + max(n - 1, 0)) // CTX
        out[k] = (start, start // CTX, end_seq)
        off += n
    return out


def test_matches_naive_sequential_layout(spark):
    rng = random.Random(5)
    rows = [(i, rng.randint(0, 250)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = {
        r["doc_id"]: (r["start_offset"], r["seq_id"], r["end_seq_id"])
        for r in pack_sequences(df, "doc_id", "n_tokens", CTX, block_size=37).collect()
    }
    assert got == _naive_layout(rows)


def test_layout_is_blocking_and_partitioning_independent(spark):
    rng = random.Random(9)
    rows = [(i, rng.randint(0, 250)) for i in range(200)]
    base = None
    for block, parts in ((16, 2), (64, 8), (4096, 3)):
        df = spark.createDataFrame(rows, "doc_id long, n_tokens int").repartition(parts)
        got = sorted(
            (r["doc_id"], r["start_offset"])
            for r in pack_sequences(df, "doc_id", "n_tokens", CTX, block_size=block).collect()
        )
        base = base or got
        assert got == base, (block, parts)


def test_boundary_flags_and_zero_token_docs(spark):
    rows = [(0, 60), (1, 60), (2, 0), (3, 30)]  # doc1 spans the 100-token cut
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = {r["doc_id"]: r for r in pack_sequences(df, "doc_id", "n_tokens", CTX).collect()}
    assert (got[0]["seq_id"], got[0]["end_seq_id"], got[0]["crosses_boundary"]) == (0, 0, False)
    assert (got[1]["seq_id"], got[1]["end_seq_id"], got[1]["crosses_boundary"]) == (0, 1, True)
    # zero-token doc occupies no space but keeps a defined offset
    assert (got[2]["start_offset"], got[2]["crosses_boundary"]) == (120, False)
    assert got[3]["start_offset"] == 120

    stats = packing_stats(
        pack_sequences(df, "doc_id", "n_tokens", CTX), "n_tokens", CTX
    ).collect()[0]
    assert stats["n_docs"] == 4 and stats["total_tokens"] == 150
    assert stats["n_sequences"] == 2 and stats["n_boundary_docs"] == 1
    assert stats["fill_fraction"] == 0.75


def test_no_global_single_partition_shuffle(spark):
    """The corpus-sized window is partitioned by block; only the tiny block
    table may sort in one partition."""
    df = spark.createDataFrame([(i, 10) for i in range(100)], "doc_id long, n_tokens int")
    out = pack_sequences(df, "doc_id", "n_tokens", CTX, block_size=16)
    plan = spark._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    # the corpus-side window must be hash-partitioned on the block key
    assert "hashpartitioning(_blk" in plan, plan[:2000]
