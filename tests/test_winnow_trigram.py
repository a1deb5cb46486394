from __future__ import annotations

from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators import textstats
from batch_doc_vqa_spark.operators.textstats import winnow_fingerprint_kernel


def test_winnow_kernel_properties():
    t = "the quick brown fox jumps over the lazy dog"
    fp1 = winnow_fingerprint_kernel(t)
    fp2 = winnow_fingerprint_kernel(t)
    assert fp1 == fp2 and len(fp1) > 0
    assert winnow_fingerprint_kernel("abc", k=5) == []  # shorter than k
    assert len(winnow_fingerprint_kernel("abcdef", k=5, w=4)) == 1  # n <= w → single min
    # case-insensitive by construction
    assert winnow_fingerprint_kernel(t.upper()) == fp1


def test_winnow_near_dup_overlap():
    base = "the quick brown fox jumps over the lazy dog again and again today"
    pert = base.replace("lazy", "hazy")
    a, b = set(winnow_fingerprint_kernel(base)), set(winnow_fingerprint_kernel(pert))
    jacc = len(a & b) / len(a | b)
    assert jacc > 0.5  # local change perturbs only nearby fingerprints
    unrelated = set(winnow_fingerprint_kernel("completely different content here entirely"))
    assert len(a & unrelated) / max(1, len(a | unrelated)) < 0.1


def test_winnow_udf_matches_kernel(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, ""),
        (2, "tiny"),
        (3, "repeated repeated repeated repeated words"),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    got = {r["doc_id"]: list(r["fingerprints"]) for r in textstats.winnow_fingerprints(df, "doc_id", "text").collect()}
    for i, t in texts:
        assert got[i] == winnow_fingerprint_kernel(t), i


def test_lang_id_trigram(spark):
    df = spark.createDataFrame(
        [
            (1, "The thing and the other thing went to the station"),
            (2, "der hund und die katze sind nicht in der schule"),
            (3, "le chien et la maison dans les montagnes que nous avons"),
            (4, "xqz zzz qqq"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["lang_guess"] for r in textstats.lang_id_trigram(df, "doc_id", "text").collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "und"
    # score columns are non-negative longs
    row = textstats.lang_id_trigram(df, "doc_id", "text").filter(F.col("doc_id") == 1).collect()[0]
    assert row["tri_en"] > row["tri_de"]
