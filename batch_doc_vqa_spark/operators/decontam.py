"""Benchmark decontamination: n-gram overlap between corpus and eval sets.

A training-data pipeline must guarantee its corpus does not contain the
benchmarks it will be evaluated on (the reference's published-run archive
plays the benchmark-set role: curated eval artifacts kept strictly apart
from inputs, /root/reference/src/batch_doc_vqa/benchmarks/published_runs.py).
The standard web-scale recipe (GPT-3 appendix C / Gopher / The Pile) flags a
document when it shares ≥ some number of word n-grams with any benchmark
item, then drops or audits the collisions.

Engine shape — corpus-linear, benchmark-broadcast:

- benchmark side: distinct n-gram hashes per benchmark item. Benchmarks are
  tiny next to a 100 TB corpus (thousands of items, not billions), so the
  hash set broadcasts: the corpus-side join is map-only, no corpus shuffle;
- corpus side: the SAME tokenizer + shingle machinery as every dedup op
  (``dedup.normalized_tokens`` / ``exploded_shingles`` — shared so the
  contamination n-grams can never drift from the dedup shingles);
- one groupBy (doc, bench) counts matches → coverage = matched / benchmark
  n-grams. The aggregate runs on join OUTPUT rows — bounded by actual
  collisions, not corpus size.

``base_hash='md5'`` (portable_hash64) makes the whole pipeline
value-checkable against a DuckDB oracle; production uses xxhash64.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _base_hash, exploded_shingles

log = logging.getLogger(__name__)

DEFAULT_NGRAM = 8  # GPT-3 uses 13-grams at full web scale; 8 suits fixtures
# one drop policy shared by the batch op and the streaming screener — a
# silent threshold divergence between the two would ship docs the batch
# pass drops
DEFAULT_DROP_THRESHOLD = 0.5
# above this many bench-side n-gram rows the broadcast tier is refused:
# a frontier eval suite (millions of items × 13-grams) can exceed executor
# memory as a broadcast table. ~20M longs ≈ 160 MB serialized — conservative
# against the default 8 GB driver / broadcast memory budget.
DEFAULT_BROADCAST_LIMIT = 20_000_000


def _ngram_hashes(df: DataFrame, id_col: str, text_col: str, n: int, base_hash: str) -> DataFrame:
    """(_id, h): distinct n-gram hashes per row, shared-tokenizer shingles."""
    sh = exploded_shingles(df, id_col, text_col, n)
    return sh.select("_id", _base_hash(F.col("sh"), base_hash).alias("h"))


# Bloom prefilter sizing for the 'bloom' join tier: ~10 bits/item with 4
# probe functions gives ~1.2% false-positive rate — prunes ≥98% of
# non-colliding corpus n-grams before the exchange at ~1/6 the broadcast
# footprint of the raw hash set (10 bits vs 64-bit hash + set overhead).
BLOOM_BITS_PER_ITEM = 10
BLOOM_K = 4


def _bloom_prefilter(doc_h: DataFrame, bench_h: DataFrame, n_bench_rows: int) -> DataFrame:
    """Corpus n-gram rows surviving a broadcast Bloom filter of the bench
    n-gram hashes — near-hits plus ≤ ~fpp false positives, NEVER a false
    negative (the exact join downstream eliminates the survivors' false
    positives, so every tier stays value-identical).

    Spark 4's runtime bloom-filter join expressions (``bloom_filter_agg`` /
    ``might_contain``) are optimizer-internal, not in the public function
    registry — so the filter is composed from public column expressions:
    the bench side folds its ``k`` probe positions into a ``(word, bits)``
    bitmap via ``bit_or`` (≤ mbits/64 rows — 1/6 the raw hash set), and the
    corpus pass checks its probes through ``k`` broadcast hash joins on the
    word index. Map-side only: the prefilter adds ZERO exchanges to the
    corpus lineage; only survivors reach the shuffle join. All probe
    positions derive from the data (``xxhash64(h, i)``), never from task
    ids."""
    mbits = max(64, n_bench_rows * BLOOM_BITS_PER_ITEM)
    probes = bench_h.select(
        F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("i"), "h"
    ).select(F.pmod(F.xxhash64("h", "i"), F.lit(mbits)).alias("pos"))
    bitmap = (
        probes.select(
            F.shiftright("pos", 6).alias("word"),
            F.col("pos").bitwiseAND(F.lit(63)).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits"))
        .localCheckpoint(eager=True)  # probed k times below — build once
    )
    pref = doc_h
    for i in range(BLOOM_K):
        pos = F.pmod(F.xxhash64(F.col("h"), F.lit(i)), F.lit(mbits))
        pref = pref.withColumn(f"_w{i}", F.shiftright(pos, 6)).withColumn(
            f"_bit{i}", pos.bitwiseAND(F.lit(63)).cast("int")
        )
        side = bitmap.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        pref = pref.join(F.broadcast(side), f"_w{i}", "left")
    hit = F.lit(True)
    for i in range(BLOOM_K):
        hit = hit & F.col(f"_b{i}").isNotNull() & (
            F.expr(f"shiftright(_b{i}, _bit{i}) & 1") == 1
        )
    drop = [c for i in range(BLOOM_K) for c in (f"_w{i}", f"_bit{i}", f"_b{i}")]
    return pref.filter(hit).drop(*drop)


def contamination_report(
    docs: DataFrame,
    doc_id: str,
    doc_text: str,
    bench: DataFrame,
    bench_id: str,
    bench_text: str,
    n: int = DEFAULT_NGRAM,
    base_hash: str = "xxhash64",
    strategy: str = "auto",
    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
) -> DataFrame:
    """(doc_id, bench_id, matched_ngrams, bench_ngrams, coverage) per
    contaminated (doc, benchmark-item) pair — rows only where ≥1 n-gram
    matches. ``coverage`` is the fraction of the benchmark item's distinct
    n-grams found in the document (rounded 6).

    ``strategy`` selects the join tier (both produce identical output):

    - ``'broadcast'`` — bench n-gram hashes ship to every executor; the
      corpus pass is map-only (zero corpus shuffle). Right whenever the
      bench side fits in executor memory — every reference-scale eval set.
    - ``'shuffle'`` — a plain hash join on the n-gram hash: the corpus
      shuffles once on ``h``, the bench side shuffles fully. The fallback
      for frontier eval suites whose n-gram set is itself too big to
      broadcast; Spark's runtime bloom-filter join
      (``spark.sql.optimizer.runtime.bloomFilter.enabled``) prunes most
      non-colliding corpus rows before the exchange.
    - ``'bloom'`` — the shuffle tier behind an EXPLICIT broadcast Bloom
      prefilter (``_bloom_prefilter``): a (word, bits) bitmap of the bench
      n-gram hashes — ~1/6 the broadcast footprint of the raw hash set —
      prunes non-colliding corpus n-grams map-side (~99% at the default
      sizing) before they reach the exchange, at zero recall loss (no
      false negatives; the exact join removes the false positives).
      Right when the bench side exceeds the broadcast budget but its
      Bloom bitmap does not — the middle tier between broadcast and
      plain shuffle, and deterministic unlike the optimizer's
      runtime filter (which is cost-model-gated).
    - ``'auto'`` (default) — counts the bench-side n-gram rows (one cheap
      aggregate over the SMALL side only) and picks: broadcast when ≤
      ``broadcast_limit``, else bloom-prefiltered shuffle. The choice is
      logged loudly — a silent tier flip would be an unexplained 1-shuffle
      regression in any plan audit.
    """
    doc_h = _ngram_hashes(docs, doc_id, doc_text, n, base_hash).withColumnRenamed(
        "_id", "doc_id"
    )
    bench_h = _ngram_hashes(bench, bench_id, bench_text, n, base_hash).withColumnRenamed(
        "_id", "bench_id"
    )
    n_bench_rows = None
    if strategy in ("auto", "bloom"):
        # materialize once: without this each downstream use (the sizing
        # count, the bloom bitmap build, the bench_sizes aggregate, and
        # the match join) would redo the full bench-side hashing job
        bench_h = bench_h.localCheckpoint(eager=True)
        n_bench_rows = bench_h.count()
    if strategy == "auto":
        strategy = "broadcast" if n_bench_rows <= broadcast_limit else "bloom"
        log.warning(
            "decontam: bench side has %d n-gram rows (limit %d) -> %s join tier",
            n_bench_rows, broadcast_limit, strategy,
        )
    if strategy not in ("broadcast", "shuffle", "bloom"):
        raise ValueError(f"unknown decontamination strategy: {strategy!r}")
    bench_sizes = bench_h.groupBy("bench_id").agg(F.count(F.lit(1)).alias("bench_ngrams"))
    if strategy == "bloom":
        doc_h = _bloom_prefilter(doc_h, bench_h, n_bench_rows)
    joined_bench = F.broadcast(bench_h) if strategy == "broadcast" else bench_h
    matches = (
        doc_h.join(joined_bench, "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("matched_ngrams"))
    )
    # bench_sizes is one row per benchmark ITEM (not per n-gram) — small in
    # both tiers, so the enrichment join always broadcasts
    return matches.join(F.broadcast(bench_sizes), "bench_id").select(
        "doc_id",
        "bench_id",
        "matched_ngrams",
        "bench_ngrams",
        F.round(F.col("matched_ngrams") / F.col("bench_ngrams"), 6).alias("coverage"),
    )


def decontaminate(
    docs: DataFrame,
    doc_id: str,
    doc_text: str,
    bench: DataFrame,
    bench_id: str,
    bench_text: str,
    n: int = DEFAULT_NGRAM,
    threshold: float = DEFAULT_DROP_THRESHOLD,
    base_hash: str = "xxhash64",
    strategy: str = "auto",
    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
) -> DataFrame:
    """Corpus minus documents whose coverage of ANY benchmark item reaches
    ``threshold`` — the drop-the-collision policy. The flagged-id frame is a
    tiny aggregate of the report, so the anti-join broadcasts.
    ``strategy``/``broadcast_limit`` select the report's join tier (see
    ``contamination_report``)."""
    report = contamination_report(
        docs, doc_id, doc_text, bench, bench_id, bench_text, n, base_hash,
        strategy=strategy, broadcast_limit=broadcast_limit,
    )
    flagged = (
        report.filter(F.col("coverage") >= threshold).select(F.col("doc_id").alias(doc_id)).distinct()
    )
    return docs.join(F.broadcast(flagged), doc_id, "left_anti")
