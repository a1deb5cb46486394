"""BPE subword tokenizer tier (VERDICT r5 #5): kernel/Spark bit-identity,
coverage/losslessness properties, chunk-window semantics, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_doc_vqa_spark.functions import bpe as kbpe
from batch_doc_vqa_spark.operators import subword
from batch_doc_vqa_spark.sources.bpe_fixture import (
    BPE_MAX_WORDS,
    BPE_MERGES,
    BPE_MIN_FREQ,
    bpe_fixture_df,
    bpe_fixture_rows,
)


def _kernel_merges():
    freqs = kbpe.word_freqs(t for _, t in bpe_fixture_rows())
    return kbpe.learn_bpe_merges(
        subword.cap_freqs(freqs, BPE_MAX_WORDS), BPE_MERGES, BPE_MIN_FREQ
    )


def test_spark_learner_matches_kernel_bit_exactly(spark):
    fx = bpe_fixture_df(spark)
    spark_merges = subword.learn_bpe(
        fx, "text", n_merges=BPE_MERGES, max_words=BPE_MAX_WORDS, min_freq=BPE_MIN_FREQ
    )
    assert spark_merges == _kernel_merges()
    assert len(spark_merges) > 20  # the fixture has real structure to learn


def test_encode_is_lossless_and_merges_reduce_counts(spark):
    merges = _kernel_merges()
    ranks = kbpe.make_ranks(merges)
    for _, text in bpe_fixture_rows(8):
        words = kbpe.normalize_words(text)
        toks = kbpe.encode_text(text, ranks)
        # losslessness: stripping the word-end markers reconstructs the text
        assert "".join(toks).replace(kbpe.END, "") == "".join(words)
        # the trained merges genuinely compress vs character-level
        char_level = sum(len(w) + 1 for w in words)
        assert 0 < len(toks) < char_level
        # and subword counts exceed word counts (BPE splits rare words)
        assert len(toks) >= len(words)


def test_spark_counts_and_tokens_match_kernel(spark):
    fx = bpe_fixture_df(spark)
    merges = _kernel_merges()
    ranks = kbpe.make_ranks(merges)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in subword.bpe_token_counts(fx, "doc_id", "text", merges).collect()
    }
    want = {i: kbpe.count_tokens(t, ranks) for i, t in bpe_fixture_rows()}
    assert got == want
    toks = {
        r["doc_id"]: list(r["tokens"])
        for r in subword.bpe_tokenize(fx.limit(6), "doc_id", "text", merges).collect()
    }
    for i, seq in toks.items():
        assert seq == kbpe.encode_text(dict(bpe_fixture_rows())[i], ranks)
    # partition-independence: same counts under a different layout
    again = {
        r["doc_id"]: r["bpe_tokens"]
        for r in subword.bpe_token_counts(
            fx.repartition(7), "doc_id", "text", merges
        ).collect()
    }
    assert again == want


def test_bpe_chunking_matches_kernel_and_covers_every_token(spark):
    fx = bpe_fixture_df(spark)
    merges = _kernel_merges()
    ranks = kbpe.make_ranks(merges)
    out = subword.bpe_chunk_documents(
        fx, "doc_id", "text", merges, chunk_tokens=32, overlap=8
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    )
    want = sorted(
        (i, idx, n, txt)
        for i, t in bpe_fixture_rows()
        for idx, n, txt in kbpe.chunk_tokens(t, ranks, 32, 8)
    )
    assert got == want
    # every subword token appears in ≥1 chunk; stride semantics hold
    for i, t in bpe_fixture_rows(5):
        toks = kbpe.encode_text(t, ranks)
        chunks = kbpe.chunk_tokens(t, ranks, 32, 8)
        covered = sum(c[1] for c in chunks) - 8 * max(len(chunks) - 1, 0)
        assert covered == len(toks)


def test_bpe_udfs_are_arrow_batched_never_row_python(spark):
    fx = bpe_fixture_df(spark)
    merges = _kernel_merges()
    for frame in (
        subword.bpe_token_counts(fx, "doc_id", "text", merges),
        subword.bpe_chunk_documents(fx, "doc_id", "text", merges, 32, 8),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" in plan


def test_bpe_units_flow_through_packing_and_budget(spark):
    """pack_sequences / budget_select consume any tokens_col — with
    bpe_token_counts upstream the packing layout and budget cuts are in
    MODEL-token units (the VERDICT r5 #5 contract)."""
    from batch_doc_vqa_spark.operators.packing import pack_sequences
    from batch_doc_vqa_spark.operators.chunking import budget_select

    fx = bpe_fixture_df(spark)
    merges = _kernel_merges()
    ranks = kbpe.make_ranks(merges)
    counts = subword.bpe_token_counts(fx, "doc_id", "text", merges)
    packed = pack_sequences(counts, "doc_id", "bpe_tokens", ctx_len=64, block_size=8)
    rows = {r["doc_id"]: r for r in packed.collect()}
    # offsets are the exact prefix sum of the kernel's counts in doc order
    acc = 0
    for i, t in bpe_fixture_rows():
        assert rows[i]["start_offset"] == acc
        acc += kbpe.count_tokens(t, ranks)
    sel = budget_select(
        counts.withColumn("src", F.lit("fixture")),
        "src", "bpe_tokens", budget=200, order_col="doc_id", id_col="doc_id",
    )
    kept = sel.agg(F.sum("bpe_tokens")).collect()[0][0]
    assert 0 < kept <= 200
