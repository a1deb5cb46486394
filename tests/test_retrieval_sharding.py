"""Round-6 additions: BM25 retrieval (hand-math mirror, rank/tie/k
semantics), token-balanced shard assignment (prefix-sum mirror, conservation,
partition independence), and the domain blocklist (suffix semantics,
label-boundary correctness, zero-shuffle plan)."""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators.packing import assign_shards, shard_stats
from batch_doc_vqa_spark.operators.retrieval import bm25_topk
from batch_doc_vqa_spark.operators.webclean import blocklist_filter, blocklist_matches


def _rnd(x: float, r: int = 6) -> float:
    # Spark round(double, r): HALF_UP on the shortest round-trip decimal
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-r), rounding=ROUND_HALF_UP)
    )


# ---------------------------------------------------------------------------
# BM25


DOCS = [
    (1, "Apple banana apple"),
    (2, "banana cherry"),
    (3, "cherry date fig"),
    (4, "date fig grape apple"),
]


def _bm25_py(docs, queries, k1=1.2, b=0.75):
    """Pure-Python mirror with the operator's exact rounding discipline."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = _rnd(sum(len(t) for t in toks.values()) / n)
    scores = {}
    for qid, qtext in queries:
        qterms = sorted(set(qtext.lower().split()))
        for term in qterms:
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf = _rnd(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
            for did, t in toks.items():
                tf = t.count(term)
                if tf == 0:
                    continue
                dl = len(t)
                c = _rnd(
                    idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                )
                key = (qid, did)
                scores[key] = scores.get(key, Decimal(0)) + Decimal(repr(c)).quantize(
                    Decimal("0.000001")
                )
    out = {}
    for qid in {q for q, _ in queries}:
        ranked = sorted(
            ((float(s), did) for (q, did), s in scores.items() if q == qid),
            key=lambda x: (-x[0], x[1]),
        )
        out[qid] = [(did, _rnd(s), r + 1) for r, (s, did) in enumerate(ranked)]
    return out


def test_bm25_hand_math_rank_and_tiebreak(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(100, "apple banana"), (200, "fig")], "query_id long, query_text string"
    )
    got = bm25_topk(docs, queries, k=10)
    rows = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in got.collect()}
    exp = _bm25_py(DOCS, [(100, "apple banana"), (200, "fig")])
    exp_rows = {
        (qid, did): (s, r) for qid, lst in exp.items() for did, s, r in lst
    }
    assert rows == exp_rows
    # the 'fig' query hits docs 3 and 4: same tf, doc 3 shorter → higher
    assert rows[(200, 3)][1] == 1 and rows[(200, 4)][1] == 2


def test_bm25_k_cut_repeated_terms_and_no_match(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q_rep = spark.createDataFrame(
        [(1, "banana banana banana"), (2, "banana")],
        "query_id long, query_text string",
    )
    got = bm25_topk(docs, q_rep, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"], r["rank"]))
    # repeated query terms count once: both queries score identically
    assert sorted(by_q[1]) == sorted(by_q[2])
    # k cut keeps exactly the top-1
    top1 = bm25_topk(docs, q_rep, k=1).collect()
    assert sorted((r["query_id"], r["rank"]) for r in top1) == [(1, 1), (2, 1)]
    # a query matching nothing emits no rows
    q_none = spark.createDataFrame([(9, "zzz qqq")], "query_id long, query_text string")
    assert bm25_topk(docs, q_none, k=5).count() == 0


def test_bm25_max_df_frac_prunes_common_terms(spark):
    # 'the' is in every doc (df=4/4); 'apple' in 2/4
    docs = spark.createDataFrame(
        [(1, "the apple pie"), (2, "the apple tart"), (3, "the cherry"), (4, "the fig")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "the apple")], "query_id long, query_text string")
    full = {r["doc_id"]: r["score"] for r in bm25_topk(docs, q, k=10).collect()}
    assert set(full) == {1, 2, 3, 4}  # 'the' matches every doc
    pruned = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, q, k=10, max_df_frac=0.5).collect()
    }
    # docs matching ONLY the pruned term drop out; survivors score on
    # 'apple' alone — equal to a query without 'the' at all
    assert set(pruned) == {1, 2}
    apple_only = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            docs, q.withColumn("query_text", F.lit("apple")), k=10
        ).collect()
    }
    assert pruned == apple_only
    # boundary: df <= frac·N keeps the term (apple df=2 == 0.5·4 survives
    # above); at 0.49 even apple is pruned → no scorable term, no rows
    assert bm25_topk(docs, q, k=10, max_df_frac=0.49).count() == 0
    with pytest.raises(ValueError, match="max_df_frac"):
        bm25_topk(docs, q, max_df_frac=1.5)


def test_bm25_validation_and_plan(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame([(1, "apple")], "query_id long, query_text string")
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, qdf, k=0)
    with pytest.raises(ValueError, match="reserved"):
        bm25_topk(docs.withColumn("_tf", docs.doc_id), qdf)
    df = bm25_topk(docs, qdf, k=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # inverted-index joins are broadcast hash; the ONLY nested-loop is the
    # one-row stats scalar attached to the query-term-sized idf dim (never
    # to the corpus side); no Python anywhere
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1, plan[:2000]
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_index_round_trip_and_store_guards(spark, tmp_path):
    from batch_doc_vqa_spark.operators.retrieval import (
        bm25_build,
        bm25_query,
        load_bm25_index,
        save_bm25_index,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(
        [(100, "apple banana"), (200, "fig")], "query_id long, query_text string"
    )
    path = str(tmp_path / "idx")
    save_bm25_index(bm25_build(docs, "doc_id", "text"), path)
    loaded = load_bm25_index(spark, path)
    a = sorted(map(tuple, bm25_query(loaded, q, k=10).collect()))
    b = sorted(map(tuple, bm25_topk(docs, q, k=10).collect()))
    assert a == b  # persisted-path bit-identity
    # create-only: a committed index refuses overwrite
    with pytest.raises(FileExistsError, match="already exists"):
        save_bm25_index(bm25_build(docs, "doc_id", "text"), path)
    # a query-restricted build must not be persisted
    restricted = bm25_build(
        docs, "doc_id", "text", vocab=spark.createDataFrame([("apple",)], "_term string")
    )
    with pytest.raises(ValueError, match="query-restricted"):
        save_bm25_index(restricted, str(tmp_path / "idx2"))
    # torn save (no marker) is invisible
    with pytest.raises(FileNotFoundError, match="no committed"):
        load_bm25_index(spark, str(tmp_path / "nowhere"))
    # a path committed under ANY OTHER marker id is also refused — the
    # torn-attempt cleanup must never delete committed foreign data
    from batch_doc_vqa_spark.plans.publish import commit_marker

    foreign = str(tmp_path / "foreign")
    spark.createDataFrame([(1,)], "x long").write.parquet(f"{foreign}/data")
    commit_marker(spark, foreign, "someone_elses_store")
    with pytest.raises(FileExistsError, match="committed data"):
        save_bm25_index(bm25_build(docs, "doc_id", "text"), foreign)
    # the refused save must not have deleted the committed foreign data
    assert spark.read.parquet(f"{foreign}/data").count() == 1


def test_assign_shards_rejects_reserved_column_collisions(spark):
    df = spark.createDataFrame(
        [(1, 10, 0)], "doc_id long, n_tokens long, shard_id long"
    )
    with pytest.raises(ValueError, match="collide with internals"):
        assign_shards(df, "doc_id", "n_tokens", 100)
    df2 = spark.createDataFrame([(1, 10, 0)], "doc_id long, n_tokens long, _draw long")
    with pytest.raises(ValueError, match="collide with internals"):
        assign_shards(df2, "doc_id", "n_tokens", 100)


# ---------------------------------------------------------------------------
# shard assignment


SHARD_ROWS = [(i, 10 + (i * 37) % 90) for i in range(1, 200)]


def test_assign_shards_mirrors_prefix_sum_and_conserves(spark):
    df = spark.createDataFrame(SHARD_ROWS, "doc_id long, n_tokens int")
    out = assign_shards(df, "doc_id", "n_tokens", 500, seed=3).collect()
    # python mirror: md5 draw order, running sum, first-fit shards
    import hashlib

    def draw(i):
        return int(hashlib.md5(f"{i}#3".encode()).hexdigest()[:15], 16)

    order = sorted(SHARD_ROWS, key=lambda r: (draw(r[0]), r[0]))
    start, exp = 0, {}
    for pos_all, (i, tk) in enumerate(order):
        sid = start // 500
        exp[i] = (sid, start - sid * 500)
        start += tk
    got = {r["doc_id"]: (r["shard_id"], r["shard_offset"]) for r in out}
    assert got == exp
    # conservation + in-shard positions are 0..n-1 in draw order
    stats = {
        r["shard_id"]: (r["n_docs"], r["shard_tokens"])
        for r in shard_stats(
            assign_shards(df, "doc_id", "n_tokens", 500, seed=3), "n_tokens"
        ).collect()
    }
    assert sum(t for _, t in stats.values()) == sum(t for _, t in SHARD_ROWS)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    for sid, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
        assert stats[sid][0] == len(poss)


def test_assign_shards_partition_independent_and_seeded(spark):
    df = spark.createDataFrame(SHARD_ROWS, "doc_id long, n_tokens int")
    a = sorted(
        assign_shards(df, "doc_id", "n_tokens", 400, seed=7).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        assign_shards(
            df.repartition(13), "doc_id", "n_tokens", 400, seed=7, block_size=1 << 50
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    # same layout under any partitioning AND any block carve
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c = assign_shards(df, "doc_id", "n_tokens", 400, seed=8).collect()
    # a different seed is a different shuffle (overwhelmingly)
    assert {r["doc_id"]: r["shard_pos"] for r in c} != {
        r["doc_id"]: r["shard_pos"] for r in a
    }
    with pytest.raises(ValueError, match="target_tokens"):
        assign_shards(df, "doc_id", "n_tokens", 0)


# ---------------------------------------------------------------------------
# domain blocklist


def test_blocklist_suffix_semantics(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://Ads.Example.ORG:443/x"),  # subdomain + case + port
            (2, "https://example.org/y"),  # exact host
            (3, "https://notexample.org/z"),  # label boundary: must NOT match
            (4, "https://deep.a.b.tracker.net/w"),  # 2-label entry, deep host
            (5, "https://clean.site.io/ok"),
            (6, "https://sub.ads.example.org/m"),  # most-specific wins
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("example.org",), ("tracker.net",), ("ads.example.org",)], "domain string"
    )
    got = {r["doc_id"]: r["blocked_domain"] for r in blocklist_matches(pages, "url", bl).collect()}
    assert got == {
        1: "ads.example.org",
        2: "example.org",
        3: None,
        4: "tracker.net",
        5: None,
        6: "ads.example.org",
    }
    kept = blocklist_filter(pages, "url", bl)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 5]
    assert kept.columns == ["doc_id", "url"]


def test_blocklist_max_labels_and_plan(spark):
    pages = spark.createDataFrame(
        [(1, "https://a.b.c.d.e.f.g.h.example.org/x")], "doc_id long, url string"
    )
    # the full 10-label host is beyond max_labels=6: only shallow entries match
    deep = "a.b.c.d.e.f.g.h.example.org"
    bl = spark.createDataFrame([(deep,), ("example.org",)], "domain string")
    got = blocklist_matches(pages, "url", bl).collect()[0]
    assert got["blocked_domain"] == "example.org"
    wide = blocklist_matches(pages, "url", bl, max_labels=10).collect()[0]
    assert wide["blocked_domain"] == deep
    df = blocklist_matches(pages, "url", bl)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the whole lookup is map-side: no shuffle anywhere, no Python, and
    # every per-level join is a broadcast HASH join
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    with pytest.raises(ValueError, match="collides"):
        blocklist_matches(pages.withColumn("blocked_domain", pages.doc_id), "url", bl)


def test_blocklist_dim_hygiene(spark):
    # duplicate + uppercase blocklist entries: one match row per url, case
    # folded on the dim side too
    pages = spark.createDataFrame(
        [(1, "https://a.example.org/x"), (2, "https://clean.io/y")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("Example.ORG",), ("example.org",), ("example.org",)], "domain string"
    )
    rows = blocklist_matches(pages, "url", bl).collect()
    assert len(rows) == 2
    got = {r["doc_id"]: r["blocked_domain"] for r in rows}
    assert got == {1: "example.org", 2: None}


# ---------------------------------------------------------------------------
# stratified split


def test_stratified_split_exact_counts_and_determinism(spark):
    from batch_doc_vqa_spark.operators.chunking import stratified_split

    rows = [(i, "s" + str(i % 3)) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = stratified_split(df, "doc_id", "source", fr, seed=2).collect()
    # exact per-stratum counts: floor boundaries, last label absorbs
    by = {}
    for r in out:
        by.setdefault((r["source"], r["split"]), 0)
        by[(r["source"], r["split"])] += 1
    for s in ("s0", "s1", "s2"):
        assert by[(s, "train")] == 80 and by[(s, "val")] == 10 and by[(s, "test")] == 10
    # pure function of (data, seed): partitioning cannot move a row
    again = stratified_split(df.repartition(11), "doc_id", "source", fr, seed=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different seed reassigns (overwhelmingly)
    other = stratified_split(df, "doc_id", "source", fr, seed=3).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_stratified_split_validation_and_remainder(spark):
    import pytest as _pytest

    from batch_doc_vqa_spark.operators.chunking import stratified_split

    df = spark.createDataFrame([(i, "x") for i in range(7)], "doc_id long, source string")
    # n=7: floor(.5*7)=3 train, floor(.75*7)=5 → 2 val, remainder 2 test
    out = stratified_split(df, "doc_id", "source", {"train": 0.5, "val": 0.25, "test": 0.25})
    counts = {}
    for r in out.collect():
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert counts == {"train": 3, "val": 2, "test": 2}
    with _pytest.raises(ValueError, match="sum to 1"):
        stratified_split(df, "doc_id", "source", {"a": 0.5, "b": 0.4})
    with _pytest.raises(ValueError, match="collides"):
        stratified_split(df.withColumn("split", df.doc_id), "doc_id", "source", {"a": 1.0})


# ---------------------------------------------------------------------------
# temperature resampling


def test_temperature_resample_flattens_and_conserves(spark):
    from batch_doc_vqa_spark.operators.chunking import temperature_resample

    # skewed groups: 400 'en', 80 'de', 20 'fr'
    rows = (
        [(i, "en") for i in range(400)]
        + [(1000 + i, "de") for i in range(80)]
        + [(2000 + i, "fr") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_resample(df, "doc_id", "lang", alpha=0.5, seed=1)
    probs = {r["lang"]: r["keep_prob"] for r in out.select("lang", "keep_prob").distinct().collect()}
    # α<1 lifts rare groups: the small groups keep everything (their
    # uncapped targets are 1.67 and 3.34 — capped at 1, never oversampled)
    # while the dominant group is thinned to T·q/n = 500·0.5985/400 ≈ 0.748
    assert probs["fr"] == probs["de"] == 1.0
    assert 0.7 < probs["en"] < 0.8
    # α=1 is the identity rebalance: every keep_prob is exactly 1
    ident = temperature_resample(df, "doc_id", "lang", alpha=1.0, seed=1)
    assert ident.count() == len(rows)
    assert {r["keep_prob"] for r in ident.select("keep_prob").distinct().collect()} == {1.0}
    # membership is a pure function of (data, seed)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_resample(
            df.repartition(9), "doc_id", "lang", alpha=0.5, seed=1
        ).collect()
    )
    assert a == b
    # explicit budget scales the kept count (±Bernoulli noise)
    budget = temperature_resample(df, "doc_id", "lang", alpha=0.5, seed=1, total_budget=250)
    assert 180 < budget.count() < 320
    with pytest.raises(ValueError, match="alpha"):
        temperature_resample(df, "doc_id", "lang", alpha=0.0)
