"""Benchmark decontamination: n-gram overlap detection + drop policy.

The GPT-3-appendix-C-style pipeline step: flag corpus docs sharing word
n-grams with benchmark items, drop above a coverage threshold."""

from __future__ import annotations

import random

import re

from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators.decontam import contamination_report, decontaminate

WORDS = [f"tok{k}" for k in range(300)]


def _text(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _fixture(spark):
    rng = random.Random(77)
    bench_items = [(f"bench{j}", _text(rng, 20)) for j in range(5)]
    docs = []
    # d0/d1: verbatim contamination (benchmark embedded mid-document)
    docs.append(("d0", _text(rng, 30) + " " + bench_items[0][1] + " " + _text(rng, 30)))
    docs.append(("d1", bench_items[1][1]))  # the whole doc IS the benchmark
    # d2: partial overlap — first 10 tokens of bench2 only (3 of 13 8-grams)
    docs.append(("d2", _text(rng, 25) + " " + " ".join(bench_items[2][1].split()[:10]) + " " + _text(rng, 25)))
    # d3/d4: clean
    docs.append(("d3", _text(rng, 60)))
    docs.append(("d4", _text(rng, 60)))
    return (
        spark.createDataFrame(docs, "doc_id string, text string"),
        spark.createDataFrame(bench_items, "bench_id string, text string"),
    )


def test_contamination_report_coverage(spark):
    docs, bench = _fixture(spark)
    rep = contamination_report(docs, "doc_id", "text", bench, "bench_id", "text", n=8)
    rows = {(r["doc_id"], r["bench_id"]): r for r in rep.collect()}
    assert rows[("d0", "bench0")]["coverage"] == 1.0  # embedded verbatim
    assert rows[("d1", "bench1")]["coverage"] == 1.0
    # 20-token item → 13 distinct-ish 8-grams; 10 shared tokens → 3 8-grams
    partial = rows[("d2", "bench2")]
    assert 0 < partial["coverage"] < 0.5
    assert partial["matched_ngrams"] == 3
    # clean docs never appear, and no cross-benchmark noise
    assert all(d not in ("d3", "d4") for d, _ in rows)


def test_decontaminate_drop_policy(spark):
    docs, bench = _fixture(spark)
    kept = decontaminate(docs, "doc_id", "text", bench, "bench_id", "text", n=8, threshold=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    # verbatim contamination dropped; partial (below threshold) and clean kept
    assert ids == {"d2", "d3", "d4"}
    # threshold low enough catches the partial overlap too
    strict = decontaminate(docs, "doc_id", "text", bench, "bench_id", "text", n=8, threshold=0.2)
    assert {r["doc_id"] for r in strict.collect()} == {"d3", "d4"}


def test_benchmark_side_broadcasts(spark):
    """Scale shape: the benchmark hash set must broadcast — the corpus side
    joins map-only, no corpus-wide shuffle for the match step."""
    docs, bench = _fixture(spark)
    rep = contamination_report(docs, "doc_id", "text", bench, "bench_id", "text", n=8)
    plan = spark._jvm.PythonSQLUtils.explainString(rep._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan  # pure JVM
    # the only Exchanges are the tiny broadcast-build sides + the
    # match-output aggregate — the corpus scan itself feeds the join directly
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", plan)) <= 1, plan[:1500]


def test_shuffle_tier_matches_broadcast_tier(spark):
    """The non-broadcast fallback (bench n-gram set too big to ship to every
    executor) must produce IDENTICAL output to the broadcast tier — the
    report is tier-invariant (VERDICT r4 #4)."""
    docs, bench = _fixture(spark)
    kw = dict(n=8)
    b = contamination_report(docs, "doc_id", "text", bench, "bench_id", "text",
                             strategy="broadcast", **kw)
    s = contamination_report(docs, "doc_id", "text", bench, "bench_id", "text",
                             strategy="shuffle", **kw)
    key = lambda r: (r["doc_id"], r["bench_id"])  # noqa: E731
    assert sorted(map(tuple, b.collect()), key=lambda t: t[:2]) == \
           sorted(map(tuple, s.collect()), key=lambda t: t[:2])
    # and the drop policy agrees through both tiers
    kb = {r["doc_id"] for r in decontaminate(docs, "doc_id", "text", bench, "bench_id",
                                             "text", n=8, threshold=0.5,
                                             strategy="broadcast").collect()}
    ks = {r["doc_id"] for r in decontaminate(docs, "doc_id", "text", bench, "bench_id",
                                             "text", n=8, threshold=0.5,
                                             strategy="shuffle").collect()}
    assert kb == ks == {"d2", "d3", "d4"}


def test_auto_tier_falls_back_when_bench_too_big(spark, caplog):
    """auto counts the bench n-gram rows against broadcast_limit and picks
    the bloom-prefiltered shuffle tier loudly; the match join must NOT
    carry a broadcast hint (Spark may still not SortMergeJoin a tiny test
    frame, so assert on the logged decision + the absence of the broadcast
    hint on the h-join)."""
    import logging

    docs, bench = _fixture(spark)
    with caplog.at_level(logging.WARNING, logger="batch_doc_vqa_spark.operators.decontam"):
        rep = contamination_report(docs, "doc_id", "text", bench, "bench_id", "text",
                                   n=8, strategy="auto", broadcast_limit=3)
    assert any("bloom join tier" in m for m in caplog.messages)
    rows = {(r["doc_id"], r["bench_id"]): r["coverage"] for r in rep.collect()}
    assert rows[("d0", "bench0")] == 1.0  # same answer through the fallback

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="batch_doc_vqa_spark.operators.decontam"):
        contamination_report(docs, "doc_id", "text", bench, "bench_id", "text",
                             n=8, strategy="auto")
    assert any("broadcast join tier" in m for m in caplog.messages)

    import pytest

    with pytest.raises(ValueError):
        contamination_report(docs, "doc_id", "text", bench, "bench_id", "text",
                             strategy="bogus")


def test_bloom_tier_matches_broadcast_tier(spark):
    """'bloom' (broadcast Bloom bitmap prefilter in front of the shuffle
    join) must be value-identical to the broadcast tier: a Bloom filter has
    no false negatives, and the exact join removes its false positives
    (VERDICT r5 #7)."""
    docs, bench = _fixture(spark)
    b = contamination_report(docs, "doc_id", "text", bench, "bench_id", "text",
                             n=8, strategy="broadcast")
    bl = contamination_report(docs, "doc_id", "text", bench, "bench_id", "text",
                              n=8, strategy="bloom")
    assert sorted(map(tuple, b.collect()), key=lambda t: t[:2]) == \
           sorted(map(tuple, bl.collect()), key=lambda t: t[:2])
    kb = {r["doc_id"] for r in decontaminate(docs, "doc_id", "text", bench, "bench_id",
                                             "text", n=8, threshold=0.5,
                                             strategy="bloom").collect()}
    assert kb == {"d2", "d3", "d4"}


def test_bloom_prefilter_prunes_clean_corpus_ngrams(spark):
    """The prefilter must actually PRUNE: on a corpus whose n-grams are
    overwhelmingly absent from the bench side, the surviving row count
    stays close to the true-hit count (fpp ~1% at the default sizing), and
    the prefilter plan adds no exchange to the corpus lineage."""
    from batch_doc_vqa_spark.operators.decontam import (
        _bloom_prefilter,
        _ngram_hashes,
    )

    docs, bench = _fixture(spark)
    doc_h = _ngram_hashes(docs, "doc_id", "text", 8, "xxhash64").withColumnRenamed(
        "_id", "doc_id"
    )
    bench_h = _ngram_hashes(bench, "bench_id", "text", 8, "xxhash64").withColumnRenamed(
        "_id", "bench_id"
    ).localCheckpoint(eager=True)
    n_bench = bench_h.count()
    surv = _bloom_prefilter(doc_h, bench_h, n_bench)
    true_hits = doc_h.join(bench_h.select("h").distinct(), "h", "left_semi").count()
    n_doc = doc_h.count()
    n_surv = surv.count()
    assert n_surv >= true_hits  # no false negatives
    # ≥90% of the non-hit corpus n-grams pruned (default sizing gives ~99%)
    assert (n_surv - true_hits) <= max(3, 0.1 * (n_doc - true_hits))
    # map-side only: the broadcast build sides are the ONLY exchanges —
    # the prefilter adds no shuffle to the corpus lineage
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
