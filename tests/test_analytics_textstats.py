from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators import analytics, multimodal, textstats


def test_pareto_frontier(spark):
    # (cost, value): frontier = (1,5),(2,7),(4,9); (3,6) dominated by (2,7)
    df = spark.createDataFrame(
        [(1.0, 5), (2.0, 7), (3.0, 6), (4.0, 9), (5.0, 9)], "cost double, val int"
    )
    got = {(r["cost"], r["val"]) for r in analytics.pareto_frontier(df, "cost", "val").collect()}
    assert got == {(1.0, 5), (2.0, 7), (4.0, 9)}


def test_pareto_scalable_matches_antijoin(spark):
    import random

    rng = random.Random(3)
    rows = [(round(rng.uniform(0, 100), 2), rng.randint(0, 50)) for _ in range(500)]
    df = spark.createDataFrame(rows, "cost double, val int").repartition(7)
    a = {(r["cost"], r["val"]) for r in analytics.pareto_frontier(df, "cost", "val").collect()}
    b = {(r["cost"], r["val"]) for r in analytics.pareto_frontier_scalable(df, "cost", "val").collect()}
    assert a == b and len(a) > 0


def test_top_k_and_latest(spark):
    df = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (1, 20, 102), (2, 5, 103)],
        "grp int, v int, id int",
    )
    top = analytics.top_k_per_group(df, "grp", "v", 1, "id").collect()
    by_grp = {r["grp"]: r["id"] for r in top}
    assert by_grp == {1: 101, 2: 103}  # tie on v=20 broken by id asc
    latest = analytics.latest_per_key(df, "grp", "v", "id")
    assert {r["id"] for r in latest.collect()} == {101, 103}


def test_calibration_bins(spark):
    df = spark.createDataFrame(
        [(0.05, True), (0.05, False), (0.95, True), (0.99, True)], "p double, ok boolean"
    )
    rows = {r["bin"]: r for r in analytics.calibration_bins(df, "p", "ok", 7).collect()}
    assert rows[0]["n"] == 2 and rows[0]["mean_correct"] == 0.5
    assert rows[6]["n"] == 2 and rows[6]["mean_correct"] == 1.0


def test_grouped_product(spark):
    df = spark.createDataFrame([(1, 0.5), (1, 0.5), (2, 0.0), (2, 0.9)], "g int, p double")
    got = {r["g"]: r["prob_product"] for r in analytics.grouped_product(df, ["g"], "p").collect()}
    assert got[1] == pytest.approx(0.25)
    assert got[2] == 0.0  # exact-zero guard, not exp(log(0))


def test_quality_features_exact(spark):
    df = spark.createDataFrame([(1, "The cat, and the dog. " * 10)], "doc_id int, text string")
    r = textstats.quality_features(df, "doc_id", "text").collect()[0]
    assert r["n_tokens"] == 50
    assert r["stopword_ratio"] == pytest.approx(0.6)  # the, and, the / 5 tokens per rep
    assert r["punct_ratio"] == pytest.approx(20 / 220, abs=1e-6)
    assert r["quality_score"] == pytest.approx(0.4 + 0.3 + 0.3)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog from home"), (2, "und der hund nicht mit aber"), (3, "zzz qqq")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["lang_guess"] for r in textstats.lang_id(df, "doc_id", "text").collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_multimodal_probe_and_frames(spark):
    df = spark.createDataFrame(
        [("m1", b"\x89PNG fake bytes", "image"), ("m2", b"RIFF fake wav", "audio"), ("m3", None, "video")],
        "media_id string, payload binary, kind string",
    )
    meta = multimodal.probe_media(df, "media_id", "payload", "kind")
    rows = {r["media_id"]: r for r in meta.collect()}
    assert rows["m1"]["decode_status"] == "stub" and rows["m1"]["width"] > 0
    assert rows["m3"]["decode_status"] == "empty" and rows["m3"]["n_bytes"] == 0
    assert rows["m2"]["sha256"] != rows["m1"]["sha256"]

    frames = multimodal.sample_frames(df, "media_id", "payload", every_ms=1000)
    per_media = {
        r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "m3" not in per_media  # null payload → no frames
    assert all(n >= 1 for n in per_media.values())
    # deterministic: same input → same frame hashes
    again = multimodal.sample_frames(df, "media_id", "payload", every_ms=1000)
    assert sorted(map(tuple, frames.collect())) == sorted(map(tuple, again.collect()))


def test_corpus_profile_approx_tier_bounds(spark, sf_dir):
    """The HLL/sketch tier must land within 5% of the exact tier on distinct
    count and median — the scale path's accuracy contract."""
    from batch_doc_vqa_spark.operators import textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = textstats.corpus_profile(docs, "doc_id", "text").collect()[0]
    approx = textstats.corpus_profile(docs, "doc_id", "text", approximate=True).collect()[0]
    assert approx["n_docs"] == exact["n_docs"]
    assert abs(approx["n_distinct"] - exact["n_distinct"]) <= 0.05 * exact["n_distinct"]
    assert abs(approx["median_chars"] - exact["median_chars"]) <= 0.05 * exact["median_chars"]
    assert approx["total_ws_tokens"] == exact["total_ws_tokens"]


def test_repetition_scores_reference_semantics(spark):
    """Mirror of assess_repetition (reference inference.py:69-96): the Spark
    operator must reproduce the kernel's ratios/decision exactly."""
    import re
    from collections import Counter

    from batch_doc_vqa_spark.operators import textstats

    def ref(text: str, min_tokens: int):
        tokens = re.findall(r"\w+|[^\s\w]", text.lower())
        total = len(tokens)
        if total < min_tokens or not tokens:
            return 0.0, False
        counts = Counter(tokens)
        rep = counts.most_common(1)[0][1] / total
        div = len(counts) / total
        consec = (
            sum(1 for i in range(total - 1) if tokens[i] == tokens[i + 1]) / (total - 1)
            if total > 1 else 0.0
        )
        score = max(rep, 1 - div, consec)
        return round(score, 6), score >= 0.22 or (div <= 0.35 and rep >= 0.18)

    texts = [
        (1, "the same word word word " * 20),                      # repetitive
        (2, " ".join(f"uniq{i} tok{i}" for i in range(60))),  # diverse
        (3, "spam! spam! spam! spam! spam! spam! spam! spam! spam! spam! "
            "spam! spam! spam! spam! spam! spam! spam! spam! spam! spam!"),
        (4, "short text"),                                          # below min
        (5, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           textstats.repetition_scores(df, "doc_id", "text", min_tokens=20).collect()}
    for doc_id, text in texts:
        exp_score, exp_flag = ref(text, 20)
        assert got[doc_id]["repetition_score"] == exp_score, doc_id
        assert got[doc_id]["is_repetitive"] == exp_flag, doc_id
    assert got[1]["is_repetitive"] and got[3]["is_repetitive"]
    assert not got[2]["is_repetitive"] and not got[4]["is_repetitive"]


def test_corpus_filter_reason_precedence(spark):
    from batch_doc_vqa_spark.operators import textstats

    texts = [
        (1, "und der nicht mit aber " * 12),                       # German → lang
        (2, "the and with that"),                                   # en but 4 tokens → too_short
        (3, "the same word word word " * 20),                       # repetitive
        (4, " ".join(f"word{i} the" if i % 6 == 0 else f"word{i}"
                      for i in range(60))),                         # clean keep
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textstats.corpus_filter(df, "doc_id", "text", min_quality=0.3,
                                   rep_min_tokens=20).collect()}
    assert out[1]["reason"] == "lang" and not out[1]["keep"]
    assert out[2]["reason"] == "too_short"
    assert out[3]["reason"] == "repetitive"
    assert out[4]["reason"] == "ok" and out[4]["keep"]


def test_trigram_entropy_orders_text_quality(spark):
    """Natural-ish text sits between degenerate repetition (low H) and
    near-random noise (high H); empty/short docs handle gracefully."""
    import math
    import random

    rng = random.Random(4)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz .,") for _ in range(600))
    natural = ("the quick brown fox jumps over the lazy dog and keeps going through "
               "fields of green grass while the sun sets slowly over distant hills ") * 4
    degenerate = "ababab" * 100
    df = spark.createDataFrame(
        [(1, natural), (2, noise), (3, degenerate), (4, "ab"), (5, "")],
        "doc_id long, text string",
    )
    from batch_doc_vqa_spark.operators import textstats

    out = {r["doc_id"]: r for r in
           textstats.char_trigram_entropy(df, "doc_id", "text").collect()}
    assert out[3]["trigram_entropy"] < out[1]["trigram_entropy"] < out[2]["trigram_entropy"]
    # degenerate 'ababab': trigrams cycle between 'aba' and 'bab' → H ≈ 1 bit
    assert abs(out[3]["trigram_entropy"] - 1.0) < 0.01
    assert out[4]["n_trigrams"] == 0 and out[4]["trigram_entropy"] == 0.0
    assert out[5]["n_trigrams"] == 0
    # exact check on a tiny case: 'aaaa' → trigrams aaa,aaa → H = 0
    one = spark.createDataFrame([(9, "aaaa")], "doc_id long, text string")
    r = textstats.char_trigram_entropy(one, "doc_id", "text").collect()[0]
    assert r["n_trigrams"] == 2 and r["distinct_trigrams"] == 1
    assert r["trigram_entropy"] == 0.0
    assert math.isfinite(out[1]["trigram_entropy"])


def test_repetition_unicode_words_flag(spark):
    """unicode_words=True matches the reference's Python-re tokenization on
    non-ASCII text (ASCII-only \\w splits 'héllo' into pieces)."""
    import re as _re

    text = "héllo héllo héllo héllo wörld wörld " * 20
    df = spark.createDataFrame([(1, text)], "id long, text string")
    uni = textstats.repetition_scores(df, "id", "text", min_tokens=10,
                                      unicode_words=True).collect()[0]
    # reference formula computed inline with Python re (unicode \w)
    toks = _re.findall(r"\w+|[^\s\w]", text.lower())
    most = max(toks.count(t) for t in set(toks))
    assert uni["repetition_ratio"] == round(most / len(toks), 6)
    ascii_row = textstats.repetition_scores(df, "id", "text", min_tokens=10).collect()[0]
    assert ascii_row["repetition_ratio"] != uni["repetition_ratio"]  # modes differ on purpose


def test_classifier_score_matches_kernel_and_separates_quality(spark):
    """Learned quality classifier (round 6): the Spark scorer must be
    byte-identical per doc to linear_clf.score_text, the trained model must
    actually separate content-like from spam-like text, and the scoring
    plan must be pure JVM."""
    from batch_doc_vqa_spark.functions.linear_clf import score_text
    from batch_doc_vqa_spark.operators.textstats import classifier_score
    from batch_doc_vqa_spark.sources.clf_fixture import (
        CLF_BUCKETS,
        clf_fixture_rows,
        trained_quality_model,
    )

    bias, weights = trained_quality_model()
    rows = [(i, t) for i, (_, t) in enumerate(clf_fixture_rows())]
    rows += [(900, ""), (901, None), (902, "unseen vocabulary entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clf_score"]
        for r in classifier_score(df, "doc_id", "text", bias, weights, CLF_BUCKETS).collect()
    }
    for i, t in rows:
        assert got[i] == score_text(t or "", bias, weights, CLF_BUCKETS), i
    # separation: content rows (odd labels start at i%2==1... label==1 at odd i)
    labels = [lab for lab, _ in clf_fixture_rows()]
    good = [got[i] for i, lab in enumerate(labels) if lab == 1]
    bad = [got[i] for i, lab in enumerate(labels) if lab == 0]
    assert min(good) > 0.9 and max(bad) < 0.1
    # empty/unseen docs fall back to sigmoid(bias)-ish neutral scores
    assert got[900] == got[901]
    # pure JVM plan, broadcast weight join
    frame = classifier_score(df, "doc_id", "text", bias, weights, CLF_BUCKETS)
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan
    # partition-independence (decimal weight sum is order-free)
    again = {
        r["doc_id"]: r["clf_score"]
        for r in classifier_score(
            df.repartition(7), "doc_id", "text", bias, weights, CLF_BUCKETS
        ).collect()
    }
    assert again == got


def test_lm_perplexity_matches_hand_math(spark):
    """Bigram LM tier (round 6): scores must equal a from-scratch Python
    recomputation of the add-alpha model on the SAME deterministic split,
    be partition-independent, handle <2-token docs with NULLs, and keep
    the whole plan JVM-side."""
    import hashlib
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x):  # Spark/DuckDB ROUND: decimal half-up on the shortest repr
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    rows = [(i, f"doc {i} " + " ".join(f"w{j % 5}" for j in range(i % 7))) for i in range(40)]
    rows += [(100, "single"), (101, ""), (102, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["ppl"])
        for r in textstats.lm_perplexity(df, "doc_id", "text").collect()
    }

    def toks(t):
        import re
        return re.sub(r"[^a-z0-9\s]", " ", (t or "").lower()).split()

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    train_ids = [i for i, _ in rows if h(str(i)) % 10 == 0]
    assert train_ids, "fixture must hit the train slot"
    c2, c1, vocab = Counter(), Counter(), set()
    for i, t in rows:
        if i in train_ids:
            ts = toks(t)
            vocab.update(ts)
            for a, b in zip(ts, ts[1:]):
                c2[(a, b)] += 1
                c1[a] += 1
    v = len(vocab)
    for i, t in rows:
        ts = toks(t)
        if len(ts) < 2:
            assert got[i] == (0, None, None), i
            continue
        lps = [
            r6(math.log((c2.get((a, b), 0) + 0.5) / (c1.get(a, 0) + 0.5 * v)))
            for a, b in zip(ts, ts[1:])
        ]
        s = float(sum(Decimal(repr(x)) for x in lps))
        avg = r6(s / len(lps))
        assert got[i] == (len(lps), avg, r6(math.exp(-avg))), i
    # partition independence (decimal sum is order-free)
    again = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["ppl"])
        for r in textstats.lm_perplexity(df.repartition(7), "doc_id", "text").collect()
    }
    assert again == got
    # pure JVM plan
    plan = (
        textstats.lm_perplexity(df, "doc_id", "text", broadcast_model=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_score_resample_membership_is_deterministic(spark):
    """GPT-3-style importance resampling: membership is a pure function of
    (id, seed); keep-rate tracks the score; no Python in the plan."""
    import hashlib

    from batch_doc_vqa_spark.operators.chunking import score_resample

    rows = [(i, [0.05, 0.5, 0.95][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    kept = {r["doc_id"]: r["draw"] for r in score_resample(df, "doc_id", "score", seed=7, base_hash="md5").collect()}

    def draw(i):
        h = int(hashlib.md5(f"{i}#7".encode()).hexdigest()[:15], 16)
        return (h % (1 << 20)) / float(1 << 20)

    expect = {i: round(draw(i), 6) for i, s in rows if draw(i) < s}
    assert kept == expect
    # keep-rate proportional to score (1000 rows per score band)
    for band, lo, hi in [(0.05, 20, 90), (0.5, 430, 570), (0.95, 910, 990)]:
        n = sum(1 for i, s in rows if s == band and i in kept)
        assert lo <= n <= hi, (band, n)
    # partition-independent and xxhash64 tier also deterministic
    a = sorted(r["doc_id"] for r in score_resample(df, "doc_id", "score", seed=3).collect())
    b = sorted(r["doc_id"] for r in score_resample(df.repartition(11), "doc_id", "score", seed=3).collect())
    assert a == b
    plan = score_resample(df, "doc_id", "score")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_ppl_buckets_rank_cut(spark):
    """CCNet tercile cut (round 6): per-lang equal-rank buckets over the
    distinct value table, ties share a bucket, NULL ppl is 'unscored',
    blocked two-layer form is identical, plan stays JVM-side."""
    from collections import defaultdict

    # en: 9 distinct values -> exact thirds; de: ties straddling a cut
    # (ranks 0-1 head, the 4-way tie at 2.0 starts at rank 2 -> middle);
    # fr: single doc; plus unscored rows in every language
    rows = (
        [(i, "en", float(10 + i)) for i in range(9)]
        + [(20, "de", 1.0), (21, "de", 1.5)]
        + [(22 + j, "de", 2.0) for j in range(4)]
        + [(30, "fr", 7.0), (40, "en", None), (41, "de", None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    out = {
        r["doc_id"]: (r["bucket"], r["tier"])
        for r in textstats.ppl_buckets(df, "doc_id", "lang", "ppl").collect()
    }

    by_lang = defaultdict(list)
    for _, lang, ppl in rows:
        if ppl is not None:
            by_lang[lang].append(ppl)
    expect = {}
    for i, lang, ppl in rows:
        if ppl is None:
            expect[i] = (None, "unscored")
            continue
        vals = by_lang[lang]
        n, r0 = len(vals), sum(1 for v in vals if v < ppl)
        b = sum(1 for k in (1, 2) if r0 * 3 >= k * n)
        expect[i] = (b, ["head", "middle", "tail"][b])
    assert out == expect
    # the de tie-block lands in ONE bucket even though it spans a cut rank
    assert len({out[22 + j] for j in range(4)}) == 1

    # partition independence + blocked form identity (block cuts mid-range)
    plain = {
        r["doc_id"]: (r["bucket"], r["tier"])
        for r in textstats.ppl_buckets(df, "doc_id", "lang", "ppl").collect()
    }
    blocked = {
        r["doc_id"]: (r["bucket"], r["tier"])
        for r in textstats.ppl_buckets(
            df.repartition(7), "doc_id", "lang", "ppl", value_block=2.5
        ).collect()
    }
    assert blocked == plain == expect

    plan = (
        textstats.ppl_buckets(df, "doc_id", "lang", "ppl", broadcast_cuts=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_ppl_buckets_rejects_degenerate_bucket_count(spark):
    import pytest

    df = spark.createDataFrame([(1, "en", 2.0)], "doc_id long, lang string, ppl double")
    with pytest.raises(ValueError, match="n_buckets"):
        textstats.ppl_buckets(df, "doc_id", "lang", "ppl", n_buckets=1)
