"""Spark side of the BPE subword tokenizer tier (VERDICT r5 #5).

Kernel = oracle: these operators broadcast the learned merge table and run
``functions.bpe`` inside Arrow-batched pandas UDFs — never per-row Python.
``pack_sequences`` / ``budget_select`` already consume an arbitrary
``tokens_col``, so piping ``bpe_token_counts`` output into them makes the
whole packing/budget layer speak model-token units; ``chunking.
chunk_documents(tokenizer='bpe')`` and ``textstats.token_counts(
tokenizer='bpe')`` delegate here.

Scale shape:

- ``learn_bpe``: ONE distributed word-count (a groupBy on the normalized
  word — the only shuffle), a bounded top-``max_words`` selection
  (TakeOrdered heap, never a global sort), then the merge-learning loop on
  the collected ≤max_words frequency table driver-side. The merge table is
  model state, not data — n_merges entries, broadcast everywhere.
- encode/count/chunk: map-only over the corpus; the per-batch word→encode
  cache inside each UDF amortizes Zipf-heavy text.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import bpe as _bpe
from .dedup import normalized_tokens


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    max_words: int = 100_000,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a corpus — distributed word counting,
    driver-side merge loop on the capped frequency table. Deterministic and
    partition-independent: the cap keeps the ``max_words`` most frequent
    words (word-asc tiebreak), and the learner itself is RNG-free. The
    pure-kernel twin (count + cap + ``learn_bpe_merges`` on the same texts)
    is bit-identical — pytest-pinned."""
    freq_rows = (
        df.select(F.explode(normalized_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    freqs = {r["w"]: r["c"] for r in freq_rows}
    return _bpe.learn_bpe_merges(freqs, n_merges, min_freq)


def cap_freqs(freqs: dict[str, int], max_words: int) -> dict[str, int]:
    """The kernel twin of ``learn_bpe``'s top-``max_words`` cap."""
    top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    return dict(top)


def _ranks_broadcast(df: DataFrame, merges):
    sc = df.sparkSession.sparkContext
    return sc.broadcast(_bpe.make_ranks(merges))


def bpe_token_counts(
    df: DataFrame, id_col: str, text_col: str, merges
) -> DataFrame:
    """(id, bpe_tokens) per document — Arrow-batched, broadcast vocab."""
    bc = _ranks_broadcast(df, merges)

    @F.pandas_udf("int")
    def cnt(s: pd.Series) -> pd.Series:
        ranks, cache = bc.value, {}
        return s.map(lambda t: _bpe.count_tokens(t or "", ranks, cache))

    return df.select(F.col(id_col), cnt(F.col(text_col)).alias("bpe_tokens"))


def bpe_tokenize(df: DataFrame, id_col: str, text_col: str, merges) -> DataFrame:
    """(id, tokens array<string>) — the full subword sequence."""
    bc = _ranks_broadcast(df, merges)

    @F.pandas_udf("array<string>")
    def enc(s: pd.Series) -> pd.Series:
        ranks, cache = bc.value, {}
        return s.map(lambda t: _bpe.encode_text(t or "", ranks, cache))

    return df.select(F.col(id_col), enc(F.col(text_col)).alias("tokens"))


def bpe_chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) in SUBWORD units — the BPE
    tier of ``chunking.chunk_documents`` (same stride / last-start window
    rule, applied to the subword sequence; chunk_text is the space-joined
    pieces — a training sample in token space). One Arrow UDF produces the
    window array; the explode pipelines into the scan, no shuffle."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    bc = _ranks_broadcast(df, merges)

    @F.pandas_udf("array<struct<chunk_idx:int,n_tokens:int,chunk_text:string>>")
    def chunks(s: pd.Series) -> pd.Series:
        ranks, cache = bc.value, {}
        return s.map(
            lambda t: _bpe.chunk_tokens(t or "", ranks, chunk_tokens, overlap, cache)
        )

    return (
        df.select(F.col(id_col), F.explode(chunks(F.col(text_col))).alias("_c"))
        .select(id_col, "_c.chunk_idx", "_c.n_tokens", "_c.chunk_text")
    )
