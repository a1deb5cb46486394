"""Incremental dedup index: a new snapshot dedups against the persisted
corpus index without re-signaturing the corpus, and matches the full batch."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators import dedup
from batch_doc_vqa_spark.operators.dedup_index import build_dedup_index, incremental_dedup_pairs

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu".split()


def _doc(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(99)
    old = [(f"old{i}", _doc(rng)) for i in range(30)]
    new = []
    for j in range(6):           # near-dups of old docs
        words = old[j][1].split()
        words[3] = "changed"
        new.append((f"new{j}", " ".join(words)))
    new.append(("new_exact", old[10][1]))          # exact dup of an old doc
    new.append(("new_unique", _doc(rng)))          # no dup
    new.append(("new_pair_a", _doc(rng)))
    new.append(("new_pair_b", new[-1][1]))         # new-vs-new exact dup
    schema = "doc_id string, text string"
    return spark.createDataFrame(old, schema), spark.createDataFrame(new, schema)


def test_incremental_matches_full_batch(spark, corpora, tmp_path):
    old, new = corpora
    path = str(tmp_path / "idx")
    build_dedup_index(old, "doc_id", "text", path)
    inc = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in incremental_dedup_pairs(spark, new, "doc_id", "text", path,
                                            threshold=0.5, update_index=False).collect()}
    full = {(r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in dedup.minhash_lsh_pairs(old.unionByName(new), "doc_id", "text",
                                             n=3, num_hashes=64, bands=16)
            .filter(F.col("est_jaccard") >= 0.5).collect()}
    # incremental == full batch restricted to pairs touching a new doc
    expected = {k: v for k, v in full.items()
                if k[0].startswith("new") or k[1].startswith("new")}
    assert inc == expected
    # the planted structure is actually found
    assert inc[("new_exact", "old10")] == 1.0
    assert inc[("new_pair_a", "new_pair_b")] == 1.0
    assert any(a == f"new{j}" or b == f"new{j}" for j in range(6) for a, b in inc)


def test_index_append_makes_next_snapshot_see_previous(spark, corpora, tmp_path):
    old, new = corpora
    path = str(tmp_path / "idx2")
    build_dedup_index(old, "doc_id", "text", path)
    incremental_dedup_pairs(spark, new, "doc_id", "text", path, update_index=True)
    # index grew by exactly |new| rows per table
    assert spark.read.parquet(f"{path}/sigs").count() == 30 + new.count()
    # a third snapshot duplicating a SECOND-snapshot doc is caught
    third = spark.createDataFrame(
        [("third_dup_of_new", [r["text"] for r in new.collect() if r["doc_id"] == "new_unique"][0])],
        "doc_id string, text string",
    )
    pairs = {(r["id_a"], r["id_b"])
             for r in incremental_dedup_pairs(spark, third, "doc_id", "text", path,
                                              update_index=False).collect()}
    assert ("new_unique", "third_dup_of_new") in pairs


def test_reingested_snapshot_is_idempotent(spark, corpora, tmp_path):
    """A retried/re-crawled snapshot (same ids) must not bloat the index with
    duplicate signature rows nor re-emit its pairs on the retry."""
    old, new = corpora
    path = str(tmp_path / "idx3")
    build_dedup_index(old, "doc_id", "text", path)
    first = incremental_dedup_pairs(spark, new, "doc_id", "text", path, update_index=True)
    assert first.count() > 0
    n_after_first = spark.read.parquet(f"{path}/sigs").count()
    # retry the SAME snapshot (partial-failure replay): ids already indexed
    retry = incremental_dedup_pairs(spark, new, "doc_id", "text", path, update_index=True)
    assert retry.count() == 0  # nothing new touches the corpus
    assert spark.read.parquet(f"{path}/sigs").count() == n_after_first  # no bloat
    assert (
        spark.read.parquet(f"{path}/sigs").groupBy("_id").count().filter("count > 1").count() == 0
    )  # no conflicting duplicate signature rows either


def test_compaction_picks_up_changed_recrawls(spark, corpora, tmp_path):
    """Append-only emulation keeps a re-crawled id's ORIGINAL signature;
    compact_dedup_index rebuilds from current state so the change lands."""
    from batch_doc_vqa_spark.operators.dedup_index import compact_dedup_index

    old, new = corpora
    path = str(tmp_path / "idx4")
    build_dedup_index(old, "doc_id", "text", path)
    # re-crawl: old0's content becomes a copy of old1's
    changed = spark.createDataFrame(
        [("old0", [r["text"] for r in old.collect() if r["doc_id"] == "old1"][0])]
        + [(r["doc_id"], r["text"]) for r in old.collect() if r["doc_id"] != "old0"],
        "doc_id string, text string",
    )
    # pre-compaction: a fresh snapshot duplicating old1 finds old1, and the
    # stale old0 signature does NOT yet reflect the re-crawl
    probe = spark.createDataFrame([("probe", changed.collect()[0]["text"])],
                                  "doc_id string, text string")
    before = {(r["id_a"], r["id_b"])
              for r in incremental_dedup_pairs(spark, probe, "doc_id", "text", path,
                                               update_index=False).collect()}
    assert ("old1", "probe") in before and ("old0", "probe") not in before
    compact_dedup_index(spark, changed, "doc_id", "text", path)
    after = {(r["id_a"], r["id_b"])
             for r in incremental_dedup_pairs(spark, probe, "doc_id", "text", path,
                                              update_index=False).collect()}
    assert {("old0", "probe"), ("old1", "probe")} <= after  # change landed


def test_torn_snapshot_is_invisible_and_retry_heals(spark, corpora, tmp_path):
    """A snapshot whose marker never landed (crash between the sigs and
    bands writes) is invisible — its docs re-enter the next attempt's
    anti-join as not-indexed, so both halves get rewritten (VERDICT-review:
    the old append order could strand a doc with a signature but no band
    rows, silently unreachable forever)."""
    import os

    from batch_doc_vqa_spark.operators.dedup_index import read_index_bands, read_index_sigs

    old, new = corpora
    path = str(tmp_path / "idx5")
    build_dedup_index(old, "doc_id", "text", path)
    incremental_dedup_pairs(spark, new, "doc_id", "text", path,
                            update_index=True, snapshot_id="snapA")
    assert read_index_sigs(spark, path).count() == 30 + new.count()
    # tear snapA: delete its marker — the data dirs stay on disk
    os.remove(f"{path}/_committed/snapA")
    assert os.path.isdir(f"{path}/sigs/snap=snapA")
    assert read_index_sigs(spark, path).count() == 30  # invisible
    assert read_index_bands(spark, path).filter("_id like 'new%'").count() == 0
    # retry heals: the snapshot's ids look un-indexed again and recommit
    pairs = incremental_dedup_pairs(spark, new, "doc_id", "text", path,
                                    update_index=True, snapshot_id="snapA")
    assert pairs.count() > 0  # pairs re-emitted (they never committed)
    assert read_index_sigs(spark, path).count() == 30 + new.count()
    assert read_index_bands(spark, path).filter("_id = 'new_exact'").count() == 16
