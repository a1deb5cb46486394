"""Deduplication operators for web-scale corpora.

The reference only needs order-preserving dedup on tiny lists
(/root/reference/src/batch_doc_vqa/benchmarks/cohorts.py:96-107,
openrouter/inference.py:503-511); a 10^12-document pipeline needs real
near-dup machinery. Four tiers, cheapest first:

- exact        : groupBy content hash — one shuffle on a 128-bit key;
- ngram Jaccard: shingle-explode + self-join on shingle — exact near-dup,
                 quadratic only within shingle buckets (small-scale oracle);
- MinHash+LSH  : signature = per-permutation min over shingle hashes, banded
                 into buckets; only bucket collisions are verified. The scale
                 path: cost is linear in corpus size + collisions;
- SimHash      : 64-bit weighted-bit fingerprint (Arrow-batched NumPy UDF),
                 near-dups = small Hamming distance via bit_count(xor).

All signatures are deterministic (fixed seeds / fixed hash family) so results
are reproducible across runs and partitionings.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 31-bit Mersenne prime: keeps a*h+b within int64 (ANSI overflow-safe)
_MERSENNE = (1 << 31) - 1


def normalized_tokens(text_col):
    """lower → strip non-alnum → whitespace split; shared by all dedup ops."""
    cleaned = F.regexp_replace(F.lower(text_col), r"[^a-z0-9\s]", " ")
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: t != F.lit(""))


def word_shingles(text_col, n: int = 3):
    """Array of word n-gram shingles (distinct).

    NB: referencing a *derived expression* inside the transform lambda makes
    Catalyst re-evaluate it per array element (no CSE inside higher-order
    functions) — pass an already-projected token column where possible; this
    convenience form is for small inputs/tests.
    """
    toks = normalized_tokens(text_col)
    return shingles_of_tokens(toks, n)


def shingles_of_tokens(tok_col, n: int = 3):
    """Shingles from a token array column (project tokens FIRST — see above).

    Docs with fewer than ``n`` tokens yield an empty array. The guard matters:
    ``sequence(1, 0)`` in Spark is the *descending* [1, 0], not empty, and the
    slice at index 0 then throws INVALID_PARAMETER_VALUE.START.
    """
    idx = F.when(
        F.size(tok_col) >= n, F.sequence(F.lit(1), F.size(tok_col) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(tok_col, i, n), " "))
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows with the tokenizer evaluated exactly once per doc."""
    toks = df.select(
        F.col(id_col).alias("_id"), normalized_tokens(F.col(text_col)).alias("_toks")
    )
    return toks.select("_id", F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("sh"))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash: (text_hash, canonical_id, n_dups).

    One shuffle on the hash; the canonical representative is the min id so the
    result is deterministic and rerun-stable.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("_id"))
        .groupBy("text_hash")
        .agg(F.min("_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Shingle-explode then self-join on the shingle key: the join only produces
    candidate pairs that share content, so the quadratic blow-up is bounded by
    bucket sizes, and Catalyst shuffles on the shingle key. This is the exact
    oracle the approximate tiers (MinHash, SimHash) are tested against.
    """
    sh = exploded_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    # SHUFFLE_HASH on the self-join: the planner misestimates the Generate
    # (explode) output and broadcasts the ENTIRE exploded shingle table —
    # a driver collect + ship of every shingle row (measured 3.2 s vs 2.3 s
    # at sf0.1). A shuffled hash join exchanges both sides in parallel (one
    # exchange, reused — identical subtrees), needs no sort, and AQE's
    # skew-join split still applies to degenerate shingle buckets.
    a, b = sh.hint("shuffle_hash").alias("a"), sh.hint("shuffle_hash").alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _hash_family(num_hashes: int, seed: int = 7) -> tuple[list[int], list[int]]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE - 1, size=num_hashes, dtype=np.int64).tolist()
    b = rng.randint(0, _MERSENNE - 1, size=num_hashes, dtype=np.int64).tolist()
    return a, b


def portable_hash64(col):
    """Engine-portable 60-bit hash: first 15 hex chars of md5 as a long.

    Identical in Spark (conv(substr(md5, 1, 15), 16, 10)) and DuckDB
    (CAST('0x' || substr(md5, 1, 15) AS BIGINT)) — lets the full MinHash
    pipeline be value-checked against a SQL oracle. xxhash64 is ~10× faster
    but Spark-only; pick per call site (default stays xxhash64).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _base_hash(col, base_hash: str):
    if base_hash == "xxhash64":
        return F.xxhash64(col)
    if base_hash == "md5":
        return portable_hash64(col)
    raise ValueError(f"unknown base_hash: {base_hash}")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 7,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Per-doc MinHash signature, all JVM-side.

    h_i(doc) = min over shingles s of (a_i * xxhash64(s) + b_i) mod p with a
    fixed seeded permutation family → stable signatures.

    Shape: explode shingles → hash once per shingle row → one groupBy with 64
    ``min`` aggregates → assemble the signature array. The base hash is
    computed exactly once per shingle (computing the whole pipeline inside 64
    array ``transform``s re-evaluates the tokenizer 64×), and the groupBy gets
    map-side partial combine, so the shuffle carries only 64 longs per doc —
    the formulation that survives 10^12 documents.
    """
    a, b = _hash_family(num_hashes, seed)
    p = F.lit(_MERSENNE)
    sh = exploded_shingles(df, id_col, text_col, n).select(
        "_id", F.pmod(_base_hash(F.col("sh"), base_hash), p).alias("_h")
    )
    agg = sh.groupBy("_id").agg(
        *[
            F.min(F.pmod(F.col("_h") * F.lit(a[i]) + F.lit(b[i]), p)).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
    )
    return agg.select(
        "_id", F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("signature")
    )


def banded_rows(
    sigs: DataFrame, num_hashes: int = 64, bands: int = 16, base_hash: str = "xxhash64"
) -> DataFrame:
    """(_id, band_idx, band_hash) rows from a (_id, signature) frame.

    The LSH banding step factored out so the one-shot pair emitter and the
    persisted incremental index (``dedup_index.py``) can never drift: both
    cut the same signatures into the same band hashes.
    """
    rows_per_band = num_hashes // bands
    return sigs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    _base_hash(
                        F.array_join(
                            F.slice(F.col("signature"), i * rows_per_band + 1, rows_per_band), ","
                        ),
                        base_hash,
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    max_bucket: int | None = None,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    Signatures are cut into ``bands`` rows-per-band chunks; docs colliding in
    any band become a candidate pair. The shuffle key is (band_idx, band_hash)
    — corpus-linear, never all-pairs. Estimated Jaccard = fraction of agreeing
    signature positions.

    ``max_bucket``: drop band buckets with more than this many members before
    the self-join. At web scale a few degenerate buckets (boilerplate-heavy
    shingles hashing alike, empty-ish docs) can hold 10^6+ docs and the
    within-bucket join goes quadratic; capping bounds the worst bucket's
    cost at max_bucket². Recall loss is confined to pairs whose ONLY
    colliding bands are mega-buckets — docs that similar almost always share
    a rarer band too. This bound is checked empirically (not just argued) on
    a seeded adversarial boilerplate-mega-cluster fixture at two cap values:
    tests/test_dedup_similarity.py::
    test_max_bucket_cap_recall_bound_on_boilerplate_megacluster.
    None (default) keeps exact banding semantics.
    """
    # materialize signatures before the self-join: otherwise the whole
    # explode+aggregate signature pipeline is recomputed for BOTH join sides.
    # localCheckpoint (not persist): blocks are released when the RDD is GC'd,
    # so a long-lived session doesn't leak cache across calls — persist() would
    # pin a CacheManager entry until an unpersist() no caller can reach.
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, seed, base_hash).localCheckpoint(
        eager=True
    )
    # the exploded self-join carries only (id, band_idx, band_hash) — the
    # 64-long signature arrays rejoin *after* candidate dedup, so the shuffle
    # payload stays 3 longs per banded row
    banded = banded_rows(sigs, num_hashes=num_hashes, bands=bands, base_hash=base_hash)
    if max_bucket is not None:
        # one extra count-per-key agg (map-side combined) prunes mega-buckets
        w_sizes = banded.groupBy("band_idx", "band_hash").agg(F.count(F.lit(1)).alias("_bn"))
        banded = banded.join(
            w_sizes.filter(F.col("_bn") <= max_bucket).drop("_bn"),
            ["band_idx", "band_hash"],
        )
    a = banded.alias("a")
    b = banded.alias("b")
    cand_ids = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sigs.select(F.col("_id").alias("id_a"), F.col("signature").alias("_sig_a"))
    sig_b = sigs.select(F.col("_id").alias("id_b"), F.col("signature").alias("_sig_b"))
    return (
        cand_ids.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.aggregate(
                    F.zip_with(F.col("_sig_a"), F.col("_sig_b"), lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(num_hashes),
                6,
            ).alias("est_jaccard"),
        )
    )


_SIMHASH_BITS = 64


def stable_token_hash64(tokens: list[str]) -> np.ndarray:
    """Pinned 64-bit token hash: first 8 bytes (little-endian) of md5(utf-8).

    md5 is contractually frozen forever, so signatures persisted to a dedup
    index survive any pandas/numpy upgrade — unlike ``pd.util.hash_array``,
    which is stable only within a pandas release. Hashing runs once per
    UNIQUE token in the batch (np.unique + inverse scatter), so the Python
    md5 loop is O(batch vocabulary), not O(token count).
    """
    uniq, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return h[inv]


def simhash_batch_kernel(texts: pd.Series) -> pd.Series:
    """Pure batch kernel: text series → int64 SimHash series.

    Vectorized across the WHOLE batch, not per doc: one tokenize pass, one
    stable hash over every unique token, one groupby((doc, hash)) for
    weights, one scatter-add into the (n_docs, 64) bit-score matrix.
    Identical output to the per-doc formulation (contributions are additive
    per hash), ~10× less per-doc Python overhead. Property-tested against
    the per-doc form.
    """
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    toks = texts.fillna("").astype(str).str.lower().str.split()
    lens = toks.map(len).to_numpy(dtype=np.int64)
    flat = [t for lst in toks for t in lst]
    if flat:
        doc_idx = np.repeat(np.arange(n), lens)
        # pinned (environment-upgrade-proof) 64-bit token hashes
        hashes = stable_token_hash64(flat)
        grp = pd.DataFrame({"d": doc_idx, "h": hashes}).groupby(["d", "h"], sort=False).size()
        d = grp.index.get_level_values(0).to_numpy(dtype=np.int64)
        h = grp.index.get_level_values(1).to_numpy().astype(np.uint64)
        w = grp.to_numpy(dtype=np.int64)
        bits = ((h[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & 1).astype(np.int64)
        score = np.zeros((n, _SIMHASH_BITS), dtype=np.int64)
        np.add.at(score, d, (bits * 2 - 1) * w[:, None])
        packed = np.packbits(score > 0, axis=1, bitorder="little").view(np.uint64).ravel()
        # docs with zero tokens keep signature 0 (score row stays all-zero
        # → packed 0 anyway, but be explicit about the empty-doc contract)
        out = np.where(lens > 0, packed, np.uint64(0))
    return pd.Series(out.view(np.int64))


def simhash_udf():
    """Arrow-batched UDF wrapper around ``simhash_batch_kernel``."""
    return F.pandas_udf(simhash_batch_kernel, "long")


def simhash_signatures_sql(
    df: DataFrame, id_col: str, text_col: str, base_hash: str = "xxhash64"
) -> DataFrame:
    """Pure-JVM SimHash: (id, sim) with zero Python on the path.

    SimHash is sign(Σ_tokens weight · (2·bit_j − 1)) per bit j — exactly 64
    sum-aggregates over (doc, token-hash, weight) rows, the same
    map-side-combined shape as ``minhash_signatures``. Compared to the Arrow
    UDF variant this stays inside codegen, and with ``base_hash='md5'``
    (portable_hash64) the whole pipeline is value-checkable against a DuckDB
    oracle. Note: tokens here are whitespace splits of lower(text) (same rule
    as the UDF kernel), but the token *hash* differs from pandas' hash_array,
    so signatures are not bit-identical across impls — Hamming semantics are.
    Docs with zero tokens produce no row (the UDF impl emits signature 0).
    """
    from functools import reduce
    from operator import add

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != F.lit("")).alias("_t"),
    )
    # r7: no (doc, token) pre-count — the bit contributions are INTEGER and
    # additive per occurrence (Σ_occurrences (2b−1) ≡ Σ_tokens w·(2b−1)
    # exactly), so the per-occurrence rows feed the 64 sums directly and the
    # old full-corpus (doc, token) exchange disappears; map-side partial
    # aggregation reduces the one remaining shuffle to 65 longs per doc.
    h = toks.select("_id", F.explode("_t").alias("t")).select(
        "_id", _base_hash(F.col("t"), base_hash).alias("h")
    )
    bit = lambda j: F.shiftrightunsigned(F.col("h"), j).bitwiseAND(F.lit(1))  # noqa: E731
    bits = h.groupBy("_id").agg(
        *[F.sum(bit(j) * 2 - 1).alias(f"_b{j}") for j in range(_SIMHASH_BITS)]
    )
    # assemble the signed 64-bit value: bit 63 contributes -2^63 (two's complement)
    term = lambda j: F.when(  # noqa: E731
        F.col(f"_b{j}") > 0, F.lit(-(1 << 63) if j == 63 else (1 << j))
    ).otherwise(F.lit(0))
    return bits.select(
        "_id", reduce(add, [term(j) for j in range(_SIMHASH_BITS)]).alias("sim")
    )


def _simhash_band_keys(scheme: str):
    """Band-key column array for a 64-bit ``sim`` column.

    - ``chunk16``: 4 disjoint 16-bit chunks. Pigeonhole-sound for Hamming ≤3
      (3 flipped bits hit ≤3 chunks, one chunk stays clean). Bucket keyspace
      is only 2^16: at 10^12 docs a bucket holds ~10^7 rows and the verify
      join goes quadratic within it — fine to ~10^9 docs, not beyond.
    - ``pair13``: 5 disjoint ~13-bit chunks, banded on all C(5,2)=10 ordered
      chunk *pairs* (~26-bit keys). With ≤3 errors, ≥2 of 5 chunks are clean,
      so some pair is clean → every true pair still collides (sound for ≤3),
      while buckets shrink by ~2^10 — the 10^12-doc scale path.
    """
    if scheme == "chunk16":
        return [
            F.shiftrightunsigned(F.col("sim"), i * 16).bitwiseAND(F.lit(0xFFFF)) for i in range(4)
        ]
    if scheme == "pair13":
        # chunk bit-offsets/widths: 13,13,13,13,12
        bounds = [(0, 13), (13, 13), (26, 13), (39, 13), (52, 12)]
        chunk = [
            F.shiftrightunsigned(F.col("sim"), off).bitwiseAND(F.lit((1 << w) - 1))
            for off, w in bounds
        ]
        return [
            chunk[i] * F.lit(1 << 13) + chunk[j]
            for i in range(5)
            for j in range(i + 1, 5)
        ]
    raise ValueError(f"unknown simhash banding scheme: {scheme}")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    scheme: str = "chunk16",
    impl: str = "sql",
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band (see ``_simhash_band_keys``), then
    verify candidates with bit_count(xor). Both schemes are exact for
    Hamming ≤3 — they find the same pair set; ``pair13`` trades 10 bands for
    ~2^10-smaller buckets and is the right choice past ~10^9 docs.

    ``impl='sql'`` (default) computes the signature as pure JVM aggregates
    (``simhash_signatures_sql``) — zero Python on the path, and with
    ``base_hash='md5'`` the whole pipeline is value-checkable against a
    DuckDB oracle; it pays explode → groupBy(doc, token) → 64
    sum-aggregates for that. ``impl='udf'`` builds the signature in one
    vectorized Arrow pass (``simhash_batch_kernel``); its token hash is the
    pinned md5-based ``stable_token_hash64``, so persisted signatures
    survive environment upgrades just like the SQL form's.

    WHY sql IS THE DEFAULT (r5 VERDICT #3 — re-costed under the
    INTERLEAVED suite methodology, the one that models a mixed/shared
    cluster workload where Python workers are recycled between queries;
    numbers in BENCH/BASELINE.md "SimHash impl costing"): across four
    independent interleaved sessions at sf0.1/local[32] the JVM tier
    measured 3.16 s with ±0.01 s spread (r5 driver 3.16, r5 builder 3.16,
    r6 ×2: 3.159/3.162), while the udf tier swung 1.15–4.44 s
    (session mins) with in-suite noise bands to 4.8 — equal-or-better
    EXPECTED cost and provably low variance vs a best-case-faster
    (idle-box ~1.4 s) but contention-sensitive Python pass. On a dedicated
    idle cluster pin ``impl='udf'`` for the ~2× best case. Signatures are
    not interchangeable across impls (different token hash — equivalence
    is on the PAIR SET, tested).

    COMPATIBILITY: the default was ``'sql'`` in round 3, ``'udf'`` in
    rounds 4-5, and is ``'sql'`` again from round 6 (evidence above) —
    BREAKING for anyone who persisted signatures under a prior default.
    This is why the contract stands: any code path that PERSISTS simhash
    signatures must pin ``impl=`` explicitly (never rely on the default),
    exactly as ``dedup_index`` pins its MinHash hash family — cross-run
    signature comparability is a bit-compatibility contract, not a
    convenience."""
    # localCheckpoint: computed once for both self-join sides, auto-released
    # on GC (see minhash_lsh_pairs).
    if impl == "sql":
        sigs = simhash_signatures_sql(df, id_col, text_col, base_hash)
    else:
        sigs = df.select(F.col(id_col).alias("_id"), simhash_udf()(F.col(text_col)).alias("sim"))
    sh = sigs.localCheckpoint(eager=True)
    chunks = sh.select(
        "_id",
        "sim",
        F.posexplode(F.array(*_simhash_band_keys(scheme))).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def _union_find_labels(edge_rows) -> dict:
    """Min-label connected components on the driver: id -> min reachable id.

    Plain DSU with path compression + union by min-root, then a final
    root-min pass. The labeling is a pure function of the edge SET (order
    never matters: the final label is the component minimum), so it is
    deterministic under any partitioning/collection order.
    """
    parent: dict = {}
    nodes: set = set()

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in nodes}


# Candidate-edge frames at or below this row count are resolved with a
# driver-side union-find instead of the iterative distributed loop: a
# bounded collect (≤ ~3 MB at the default) in exchange for dropping
# O(log diameter) sequential join+aggregate rounds — the same size-gated
# local/distributed split a broadcast join makes. Near-dup candidate sets
# above the gate (any real corpus) take the distributed path unchanged.
DRIVER_CC_MAX_EDGES = 100_000


def resolve_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 30,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Candidate pairs → duplicate clusters: (id, cluster_id = min id reachable).

    The step after pair emission that a real 100 TB dedup actually ships
    (reference analogue: dedup-with-precedence, openrouter/inference.py:503-511
    — but at corpus scale): connected components via iterative min-label
    propagation, the standard scale-out CC formulation (one hash join + one
    groupBy-min per round, O(cluster diameter) rounds — near-dup clusters have
    tiny diameters). Each round localCheckpoints to truncate lineage; the
    convergence probe is an exact-decimal label-sum aggregate (labels are
    elementwise non-increasing, so an unchanged sum IS the fixed point) with
    a join-probe fallback for non-numeric ids. Edge sets at or below
    ``driver_max_edges`` skip the loop entirely: a broadcast-scale collect +
    driver union-find (``_union_find_labels``) yields the identical
    component-min labels — the same size-gated local/distributed split a
    broadcast join makes (tier-equality tested both ways).

    ``ids`` supplies the full id universe so singletons resolve to themselves.
    ``pairs`` needs columns (id_a, id_b).
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # size gate (see DRIVER_CC_MAX_EDGES): a candidate-pair graph small
    # enough to broadcast is resolved on the driver in one collect instead
    # of O(log diameter) sequential distributed rounds; identical labels
    # (component min) by construction. The count is a cheap metadata-scale
    # job on the just-checkpointed frame.
    if driver_max_edges and edges.count() <= driver_max_edges:
        lab = _union_find_labels(
            (r[0], r[1]) for r in edges.collect()
        )
        spark = edges.sparkSession
        id_type = edges.schema["src"].dataType
        schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("cluster_id", id_type)]
        )
        resolved = spark.createDataFrame(sorted(lab.items()), schema)
        return (
            ids.select(F.col(id_col).alias("id"))
            .distinct()
            .join(F.broadcast(resolved), "id", "left")
            .select("id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id"))
        )
    # iterate only over edge-endpoint nodes: singletons can never change label,
    # and dup candidates are a small fraction of the corpus — at 10^11 docs
    # this shrinks every round's join from corpus-size to candidate-size.
    # Singletons rejoin as their own cluster at the end.
    #
    # init folds the FIRST propagation round into the endpoint aggregate:
    # label(v) = min(v, min neighbor) — same single groupBy the old
    # distinct-endpoints init paid, one round of convergence for free.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("_mn")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    # Convergence probe: labels are elementwise NON-INCREASING (every update
    # is a min over a set containing the old label), so Σ label is strictly
    # decreasing until the fixed point — an exact-decimal one-stage aggregate
    # on the just-checkpointed frame replaces the old join+filter+limit probe
    # (one shuffle join per round saved). Falls back to the join probe for
    # non-numeric id types, where a sum is undefined.
    numeric_ids = isinstance(
        labels.schema["label"].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )

    def _label_sum(frame):
        return frame.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("_s")
        ).collect()[0][0]

    prev_sum = _label_sum(labels) if numeric_ids else None
    for _ in range(max_iter):
        msgs = edges.join(
            labels.select(F.col("id").alias("src"), F.col("label").alias("_ml")), "src"
        ).select(F.col("dst").alias("id"), F.col("_ml").alias("label"))
        prop = labels.unionByName(msgs).groupBy("id").agg(F.min("label").alias("label"))
        # pointer jumping: label <- min(label, label-of-label). Plain neighbor
        # propagation converges in O(cluster diameter) rounds — a pathological
        # chain would exceed max_iter; the shortcut halves the distance to the
        # cluster minimum every round, giving O(log diameter).
        lut = prop.select(F.col("id").alias("label"), F.col("label").alias("_ll"))
        new_labels = (
            prop.join(lut, "label", "left")
            .select("id", F.least(F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))).alias("label"))
        ).localCheckpoint(eager=True)
        if numeric_ids:
            new_sum = _label_sum(new_labels)
            changed = 0 if new_sum == prev_sum else 1
            prev_sum = new_sum
        else:
            changed = (
                new_labels.select("id", F.col("label").alias("_new"))
                .join(labels, "id")
                .filter(F.col("_new") != F.col("label"))
                .limit(1)
                .count()
            )
        labels = new_labels
        if changed == 0:
            break
    resolved = labels.select("id", F.col("label").alias("cluster_id"))
    return (
        ids.select(F.col(id_col).alias("id"))
        .distinct()
        .join(resolved, "id", "left")
        .select("id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id"))
    )


def _keep_one(
    ids: DataFrame, pairs: DataFrame, id_col: str, resolver: str = "label"
) -> DataFrame:
    """pairs → clusters → (id, cluster_id, keep, cluster_size) keep-one frame.

    cluster_size via a window over cluster_id: ONE shuffle of the frame,
    vs groupBy-then-join's shuffle of both the aggregate and the probe side.

    ``resolver``: ``'label'`` — min-label propagation + pointer jumping
    (``resolve_clusters``; right for near-dup clusters, whose diameters are
    tiny); ``'star'`` — large-star/small-star edge contraction
    (``graphs.connected_components``; the unbounded-topology tier, same
    labels by construction — both converge to the component minimum, so the
    tiers are output-identical and share one oracle).
    """
    from pyspark.sql import Window

    if resolver == "label":
        clusters = resolve_clusters(ids.select(id_col), pairs, id_col=id_col)
    elif resolver == "star":
        from .graphs import connected_components

        clusters = connected_components(
            ids.select(id_col), pairs, id_col=id_col
        ).select("id", F.col("component_id").alias("cluster_id"))
    else:
        raise ValueError(f"_keep_one: unknown resolver {resolver!r}")
    w = Window.partitionBy("cluster_id")
    return clusters.select(
        "id",
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("keep"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def dedup_resolve(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """End-to-end near-dup dedup: exact Jaccard pairs → clusters → keep-one.

    Returns (id, cluster_id, keep, cluster_size): ``keep`` marks the canonical
    (minimum-id) member of each near-dup cluster. Built on the exact-pair tier
    so it is SQL-oracle-checkable; ``dedup_resolve_lsh`` is the same resolution
    plan on MinHash+LSH candidates — the composition a 100 TB dedup ships.
    """
    pairs = jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    return _keep_one(df, pairs, id_col)


def dedup_resolve_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 7,
    max_bucket: int | None = None,
    base_hash: str = "xxhash64",
    resolver: str = "label",
) -> DataFrame:
    """The scale dedup composition end-to-end: MinHash+LSH candidate pairs
    (est_jaccard ≥ threshold) → connected components → keep-one.

    This is the plan a 10^12-document dedup actually runs — every stage is
    corpus-linear (banded LSH candidates, min-label-propagation components) —
    exercised as one pipeline rather than swapping tiers on paper. With
    ``base_hash='md5'`` the whole thing is value-checkable against a DuckDB
    oracle (portable hash, see ``portable_hash64``).
    """
    pairs = minhash_lsh_pairs(
        df, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands,
        seed=seed, max_bucket=max_bucket, base_hash=base_hash,
    ).filter(F.col("est_jaccard") >= threshold)
    return _keep_one(df, pairs, id_col, resolver=resolver)


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    min_docs: int = 2,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Cross-document duplicated k-token spans with positions — exact
    substring dedup in the sense of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"), the suffix-array step re-expressed
    as windowed hashing + interval merge.

    Output: (id, span_start, span_end, n_windows) — token positions
    (1-based, inclusive) of each maximal run of k-token windows whose hash
    occurs in ≥ ``min_docs`` distinct documents. Downstream removal is a
    per-doc slice-out of these spans.

    Shape: window hashes are generated in-array (transform over sequence —
    no Python), exploded once; "shared by ≥N docs" is a two-level
    combine-aggregated groupBy on the 8-byte hash; the interval merge is the
    sessionization pattern (lag + conditional cumsum) per document. Every
    shuffle key is a long — corpus-linear at 10^12 docs.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")).alias("_t"),
    ).withColumn("_n", F.size("_t"))
    idx = F.when(
        F.col("_n") >= k, F.sequence(F.lit(1), F.col("_n") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    win = toks.select(
        "_id",
        F.posexplode(
            F.transform(idx, lambda i: _base_hash(F.array_join(F.slice("_t", i, k), " "), base_hash))
        ).alias("_pos0", "_h"),
    ).select("_id", (F.col("_pos0") + 1).alias("pos"), "_h")
    # one aggregate, not distinct()-then-count: count(DISTINCT _id) partial-
    # deduplicates (hash, doc) map-side and exchanges once on _h, where the
    # old shape paid a (hash, doc) exchange for distinct() plus a second
    # exchange for the count
    shared = (
        win.groupBy("_h")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h")
    )
    dup = win.join(shared, "_h").select("_id", "pos")
    w = Window.partitionBy("_id").orderBy("pos")
    runs = dup.withColumn(
        "_new", (F.coalesce(F.col("pos") - F.lag("pos").over(w), F.lit(k + 1)) > k).cast("int")
    ).withColumn("_span", F.sum("_new").over(w))
    return (
        runs.groupBy("_id", "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(F.col("_id").alias(id_col), "span_start", "span_end", "n_windows")
    )


def remove_duplicate_spans(
    df: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Slice duplicated spans out of each document's token stream.

    ``spans``: output of ``duplicate_spans`` (id, span_start, span_end —
    1-based inclusive token positions). Spans aggregate to ONE array row per
    doc, join back on the id, and tokens are dropped positionally with an
    indexed ``filter`` + ``exists`` — all in-plan, one small join, no Python.
    Docs without spans pass through byte-identical.
    """
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = df.join(sp, id_col, "left")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    kept = F.filter(
        toks,
        lambda t, i: ~F.coalesce(
            F.exists(
                F.col("_spans"),
                lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
            ),
            F.lit(False),
        ),
    )
    cleaned = F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
        F.array_join(kept, " ")
    )
    return joined.withColumn(text_col, cleaned).drop("_spans")
