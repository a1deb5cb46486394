"""Entity/extraction matching — the reference's string-matching query core.

Reimplements the semantics of
/root/reference/src/batch_doc_vqa/utils/string_matching.py (cross join at
:279, per-pair Levenshtein at :283-291, cutoff+groupBy at :299-318) and the
best-match/digit-accuracy stats of
/root/reference/src/batch_doc_vqa/benchmarks/table_generator.py:691-777 —
as pure DataFrame plans: broadcast cross join, built-in ``levenshtein``
(wrapped in ``lower()`` because the reference casefolds, string_matching.py:29),
groupBy-min, window argmin. Zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

D_CUTOFF = 3  # reference: string_matching.py:13


def surname_candidates(name_col):
    """Candidate surname array mirroring the reference's expansion exactly
    (string_matching.py:46-96 / get_surname_candidates):

    - surname tokens = last TWO tokens individually when the name has >= 3
      tokens (compound-surname handling), else just the last token;
    - per-token variants = the token itself, its hyphen-split parts, and the
      hyphen-free concatenation (Garcia-Lopez -> Garcia, Lopez, GarciaLopez);
    - casefold dedup (lower() + array_distinct here — distances are computed
      on lowered strings anyway).

    No space-joined variants: the reference never emits them.
    """
    toks = F.filter(F.split(F.trim(name_col), r"\s+"), lambda t: t != F.lit(""))
    surname_toks = (
        F.when(F.size(toks) >= 3, F.slice(toks, -2, 2))
        .when(F.size(toks) >= 1, F.slice(toks, -1, 1))
        .otherwise(F.array().cast("array<string>"))
    )
    variants = F.flatten(
        F.transform(
            surname_toks,
            lambda t: F.when(
                t.contains("-"),
                F.concat(
                    F.array(t),
                    F.filter(F.split(t, "-"), lambda p: p != F.lit("")),
                    F.array(F.array_join(F.split(t, "-"), "")),
                ),
            ).otherwise(F.array(t)),
        )
    )
    return F.array_distinct(
        F.transform(F.filter(variants, lambda v: v != F.lit("")), lambda c: F.lower(c))
    )


def pair_distances(
    extracted: DataFrame,
    truth: DataFrame,
    ex_id: str = "llm_id",
    ex_name: str = "llm_fullname",
    t_id: str = "student_id",
    t_name: str = "student_full_name",
) -> DataFrame:
    """Cross join extracted × truth with id/lastname edit distances.

    Truth is small (dozens of rows — reference q11 has 32): broadcast, so the
    cross join is a broadcast nested-loop with no shuffle of the big side.
    """
    # candidate arrays are PROJECTED as columns on both sides before the
    # join: referencing the candidate *expression* inside the transform
    # lambda would make Catalyst re-evaluate the whole expansion per array
    # element (no CSE inside higher-order functions)
    ex = extracted.withColumn("_cand", surname_candidates(F.col(ex_name)))
    truth = truth.withColumn("_tcand", surname_candidates(F.col(t_name)))
    # grouping key downstream is the *extraction-side* doc (the reference
    # groups the crossed frame by the manifest doc, string_matching.py:299);
    # rename truth's clashing columns
    for c in truth.columns:
        if c in ex.columns:
            truth = truth.withColumnRenamed(c, f"truth_{c}")
    pairs = ex.crossJoin(F.broadcast(truth))
    # relaxed lastname distance = min over candidate × candidate pairs
    lastname_d = F.array_min(
        F.flatten(
            F.transform(
                F.col("_cand"),
                lambda a: F.transform(F.col("_tcand"), lambda b: F.levenshtein(a, b)),
            )
        )
    )
    return (
        pairs.withColumn("id_distance", F.levenshtein(F.lower(F.col(ex_id)), F.lower(F.col(t_id))))
        .withColumn("lastname_distance", lastname_d)
        .drop("_cand", "_tcand")
    )


def best_matches(distances: DataFrame, doc_col: str = "doc", truth_id: str = "student_id") -> DataFrame:
    """Cutoff filter → per-(doc, truth) min distances → found flag (A1)."""
    return (
        distances.filter((F.col("id_distance") <= D_CUTOFF) | (F.col("lastname_distance") == 0))
        .groupBy(doc_col, truth_id)
        .agg(
            F.min("id_distance").alias("id_distance"),
            F.min("lastname_distance").alias("lastname_distance"),
        )
        .withColumn(
            "found",
            (F.col("id_distance") <= D_CUTOFF) | (F.col("lastname_distance") == 0),
        )
    )


def best_match_per_doc(
    distances: DataFrame, doc_col: str = "doc", tiebreaks: tuple[str, ...] = ("lastname_distance",)
) -> DataFrame:
    """Argmin over each doc (W1): the row with the smallest id_distance.

    ``tiebreaks`` extends the ordering so the pick is a pure function of the
    data (the reference's idxmin keeps first-in-frame order, which has no
    distributed analogue — rankings always carry explicit tiebreak columns).
    """
    w = Window.partitionBy(doc_col).orderBy("id_distance", *tiebreaks)
    return distances.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def digit_accuracy_chain(distances: DataFrame, doc_col: str = "doc", width: int = 8) -> DataFrame:
    """The reference's full digit-accuracy composition (table_generator.py:700-730):
    best match per doc (J4/W1) → per-digit explode of matched (llm_id,
    student_id) pairs (A3) → mean·100. One row: (digit_top1, n_digits)."""
    best = best_match_per_doc(distances, doc_col, tiebreaks=("lastname_distance", "student_id"))
    pad = lambda c: F.split(F.lpad(F.col(c).cast("string"), width, "0"), "")  # noqa: E731
    z = F.zip_with(pad("student_id"), pad("llm_id"), lambda a, b: (a == b).cast("int"))
    return best.select(F.explode(z).alias("ok")).agg(
        F.round(F.avg("ok") * 100, 6).alias("digit_top1"),
        F.count(F.lit(1)).alias("n_digits"),
    )


def detection_stats(distances: DataFrame, doc_col: str = "doc") -> DataFrame:
    """Per-doc min distances → detection rate summary (A2).

    Reference: groupby('doc').min() then detected = id ≤ cutoff OR lastname
    == 0, rate = detected/expected·100
    (/root/reference/src/batch_doc_vqa/benchmarks/table_generator.py:752-766).
    """
    per_doc = distances.groupBy(doc_col).agg(
        F.min("id_distance").alias("min_id"),
        F.min("lastname_distance").alias("min_lastname"),
    )
    detected = (F.col("min_id") <= D_CUTOFF) | (F.col("min_lastname") == 0)
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(detected.cast("long")).alias("n_detected"),
        F.round(F.avg(detected.cast("double")) * 100, 6).alias("docs_detected_pct"),
    )


def accuracy_stats(best_per_doc: DataFrame) -> DataFrame:
    """Scalar accuracy metrics over best-match rows (A4/A5).

    id_top1 = share of exact ids ·100, avg_lev = mean distance, n_perfect =
    count of zero-distance matches (table_generator.py:735-744,
    string_matching.py:292-295)."""
    return best_per_doc.agg(
        F.round(F.avg((F.col("id_distance") == 0).cast("double")) * 100, 6).alias("id_top1"),
        F.round(F.avg("id_distance"), 6).alias("id_avg_lev"),
        F.round(F.avg((F.col("lastname_distance") == 0).cast("double")) * 100, 6).alias("lastname_top1"),
        F.sum((F.col("id_distance") == 0).cast("long")).alias("n_perfect_id"),
    )


def digit_accuracy(df: DataFrame, pred_col: str, truth_col: str, width: int = 8) -> DataFrame:
    """Digit-level accuracy via aligned posexplode (A3).

    Reference explodes 8-char ids into per-digit rows and means the equality
    (table_generator.py:714-730); here: zip the padded digit arrays and
    average elementwise equality.
    """
    pad = lambda c: F.split(F.lpad(F.col(c).cast("string"), width, "0"), "")  # noqa: E731
    z = F.zip_with(pad(pred_col), pad(truth_col), lambda a, b: (a == b).cast("int"))
    return df.select(
        F.explode(z).alias("digit_ok")
    ).agg(F.avg("digit_ok").alias("digit_top1"))
