"""Schema-validation ladder (X6/P6): strict fail-row vs lenient coerce+log.

Mirrors the reference's Draft 2020-12 subset — required/type/pattern — and
its ``_schema_corrections`` log (openrouter/inference.py:2028-2034,
extraction_adapter.py:52-67).
"""

from __future__ import annotations

from batch_doc_vqa_spark.plans.validate import FieldRule, validate_coerce

RULES = [
    FieldRule("sid", "string", r"^[0-9]{4}$", required=True),
    FieldRule("score", "double"),
    FieldRule("label", "string", required=True),
]

ROWS = [
    (1, "1234", "3.5", "ok"),        # clean
    (2, "12x4", "3.5", "ok"),        # sid pattern
    (3, "1234", "oops", "ok"),       # score type
    (4, "1234", None, ""),           # label required (score null+optional: fine)
    (5, None, "bad", None),          # sid required + score type + label required
]
SCHEMA = "id long, sid string, score string, label string"


def test_lenient_nulls_fields_and_logs_corrections(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r["id"]: r for r in validate_coerce(df, RULES, strict=False).collect()}
    assert all(r["valid"] for r in out.values())
    r1 = out[1]
    assert (r1["sid"], r1["score"], r1["label"]) == ("1234", 3.5, "ok")
    assert r1["corrections"] == [] and r1["first_violation"] is None
    assert out[2]["sid"] is None and out[2]["corrections"] == ["sid:pattern"]
    assert out[3]["score"] is None and out[3]["corrections"] == ["score:type"]
    # null score with no violation coerces to NULL double, not an ANSI error
    assert out[4]["score"] is None and out[4]["corrections"] == ["label:required"]
    assert out[5]["corrections"] == ["sid:required", "score:type", "label:required"]
    assert out[5]["first_violation"] == "sid:required"


def test_strict_fails_rows_keeps_raw_values(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r["id"]: r for r in validate_coerce(df, RULES, strict=True).collect()}
    assert out[1]["valid"] and out[1]["first_violation"] is None
    assert not out[2]["valid"] and out[2]["first_violation"] == "sid:pattern"
    # raw value preserved for the quarantine sink
    assert out[2]["sid"] == "12x4" and out[3]["score"] == "oops"
    assert not out[5]["valid"] and out[5]["first_violation"] == "sid:required"
    assert "corrections" not in out[1].asDict()


def test_required_blank_vs_whitespace(spark):
    df = spark.createDataFrame([(1, "  "), (2, "x")], "id long, label string")
    rules = [FieldRule("label", "string", required=True)]
    out = {r["id"]: r for r in validate_coerce(df, rules, strict=True).collect()}
    assert not out[1]["valid"] and out[2]["valid"]
