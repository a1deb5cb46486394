"""Incremental near-dup index: dedup a NEW snapshot against an existing
corpus without re-signaturing the corpus.

At 10^12 documents, dedup is not a batch job — each crawl snapshot arrives
against an already-deduped corpus. The index persists exactly what the
banded-LSH pair emitter computes (MinHash signatures + band rows,
``dedup.banded_rows`` shared so they cannot drift), and an incremental pass
costs O(|new|) signature work plus band-key joins:

- new-vs-old candidates: new band rows ⋈ index band rows on (band_idx,
  band_hash) — the index side can be bucketed on the band key so this join
  is exchange-free on the big side;
- new-vs-new candidates: self-join of the new band rows (tiny);
- verification joins fetch signatures from the index for the old ids only.

Signature comparability across runs is exactly why the hash family is
seeded and the token hash pinned (``_hash_family`` seed, md5-based
``portable_hash64`` / ``stable_token_hash64``): an index written last month
meets this month's snapshot bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import banded_rows, minhash_signatures

INDEX_PARAMS = dict(n=3, num_hashes=64, bands=16, seed=7, base_hash="xxhash64")


def build_dedup_index(
    df: DataFrame, id_col: str, text_col: str, path: str, mode: str = "overwrite", **params
) -> None:
    """Signature + band tables for a corpus → ``{path}/sigs``, ``{path}/bands``."""
    p = {**INDEX_PARAMS, **params}
    sigs = minhash_signatures(
        df, id_col, text_col, p["n"], p["num_hashes"], p["seed"], p["base_hash"]
    ).localCheckpoint(eager=True)
    sigs.write.mode(mode).parquet(f"{path}/sigs")
    banded_rows(sigs, p["num_hashes"], p["bands"], p["base_hash"]).write.mode(mode).parquet(
        f"{path}/bands"
    )


def compact_dedup_index(
    spark: SparkSession, current_docs: DataFrame, id_col: str, text_col: str, path: str, **params
) -> None:
    """Rebuild the index from the CURRENT corpus state — the maintenance
    pass that picks up content changes for re-crawled ids (the append-only
    emulation keeps a re-ingested id's ORIGINAL signature until this runs;
    an Iceberg MERGE would update in place). Staged write → swap: the old
    index stays readable until both new tables land."""
    tmp = f"{path}__compacting"
    build_dedup_index(current_docs, id_col, text_col, tmp, mode="overwrite", **params)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    old, new = jvm.org.apache.hadoop.fs.Path(path), jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(old):
        fs.delete(old, True)
    fs.rename(new, old)


def incremental_dedup_pairs(
    spark: SparkSession,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    threshold: float = 0.5,
    update_index: bool = True,
    **params,
) -> DataFrame:
    """Near-dup pairs of a new snapshot vs (index ∪ itself); appends the new
    rows to the index afterwards so the next snapshot sees them.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b lexicographically —
    identical to what a full-batch ``minhash_lsh_pairs`` over (old ∪ new)
    would emit for pairs touching at least one new document.

    Re-ingestion safe: a doc_id present in BOTH the index and the snapshot
    (re-crawl, or a retried snapshot after a partial failure) is treated as
    already indexed — its index rows stay authoritative for this pass, and
    the append anti-joins on indexed ids so retries never bloat the index or
    produce conflicting duplicate signature rows. A re-crawl whose CONTENT
    changed therefore keeps its original signature until the next index
    rebuild/compaction — the append-only parquet emulation can't update in
    place (an Iceberg MERGE would; see plans/enrich.py for the pattern).
    """
    p = {**INDEX_PARAMS, **params}
    all_new_sigs = minhash_signatures(
        new_docs, id_col, text_col, p["n"], p["num_hashes"], p["seed"], p["base_hash"]
    ).localCheckpoint(eager=True)
    old_bands = spark.read.parquet(f"{path}/bands")
    old_sigs = spark.read.parquet(f"{path}/sigs")
    # ids-only anti-join: drop snapshot rows already in the index (the id
    # set is tiny next to the signatures — one broadcast-able column)
    new_sigs = all_new_sigs.join(
        old_sigs.select("_id"), "_id", "left_anti"
    ).localCheckpoint(eager=True)
    new_bands = banded_rows(new_sigs, p["num_hashes"], p["bands"], p["base_hash"]).localCheckpoint(
        eager=True
    )

    nb, ob = new_bands.alias("n"), old_bands.alias("o")
    vs_old = nb.join(
        ob,
        (F.col("n.band_idx") == F.col("o.band_idx"))
        & (F.col("n.band_hash") == F.col("o.band_hash"))
        & (F.col("n._id") != F.col("o._id")),
    ).select(
        F.least(F.col("n._id"), F.col("o._id")).alias("id_a"),
        F.greatest(F.col("n._id"), F.col("o._id")).alias("id_b"),
    )
    na, nb2 = new_bands.alias("a"), new_bands.alias("b")
    vs_new = na.join(
        nb2,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    cand = vs_old.unionByName(vs_new).dropDuplicates(["id_a", "id_b"])

    all_sigs = old_sigs.unionByName(new_sigs)
    sig_a = all_sigs.select(F.col("_id").alias("id_a"), F.col("signature").alias("_sa"))
    sig_b = all_sigs.select(F.col("_id").alias("id_b"), F.col("signature").alias("_sb"))
    pairs = (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.aggregate(
                    F.zip_with(F.col("_sa"), F.col("_sb"), lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(p["num_hashes"]),
                6,
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .localCheckpoint(eager=True)  # materialize BEFORE the index append below
    )
    if update_index:
        new_sigs.write.mode("append").parquet(f"{path}/sigs")
        new_bands.write.mode("append").parquet(f"{path}/bands")
    return pairs
