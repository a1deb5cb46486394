"""PII detection + redaction cascade: typed placeholders, pinned order,
pure column expressions (no Python eval nodes)."""

from __future__ import annotations

import re

from batch_doc_vqa_spark.operators.pii import PII_PATTERNS, pii_report, redact_pii

ROWS = [
    (1, "write to alice@example.org or bob.smith@sub.domain.co today"),
    (2, "server 10.0.0.1 talked to 192.168.255.254"),
    (3, "ssn 123-45-6789 card 4111-1111-1111-1111 phone 555-867-5309"),
    (4, "a perfectly clean sentence with numbers 12345 and dots..."),
    (5, ""),
]
SCHEMA = "id long, text string"


def test_report_counts_per_category(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r["id"]: r for r in pii_report(df, "id", "text").collect()}
    assert (out[1]["n_email"], out[1]["n_pii"]) == (2, 2)
    assert (out[2]["n_ipv4"], out[2]["n_pii"]) == (2, 2)
    assert (out[3]["n_ssn"], out[3]["n_card"], out[3]["n_phone"]) == (1, 1, 1)
    assert out[3]["n_pii"] == 3
    assert out[4]["n_pii"] == 0 and out[5]["n_pii"] == 0


def test_redact_rewrites_with_typed_placeholders(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r["id"]: r for r in redact_pii(df, "id", "text").collect()}
    assert out[1]["text"] == "write to [EMAIL] or [EMAIL] today"
    assert out[2]["text"] == "server [IP] talked to [IP]"
    assert out[3]["text"] == "ssn [SSN] card [CARD] phone [PHONE]"
    assert out[3]["n_redactions"] == 3
    assert out[4]["text"] == ROWS[3][1] and out[4]["n_redactions"] == 0


def test_cascade_order_prevents_double_redaction(spark):
    """A card number must redact as ONE [CARD], not leak digit runs into the
    ssn/phone patterns; an email's digits never count as a phone."""
    df = spark.createDataFrame(
        [(1, "pay 4111-1111-1111-1111 now"), (2, "mail 555-867-5309@x.com ok")],
        SCHEMA,
    )
    out = {r["id"]: r for r in redact_pii(df, "id", "text").collect()}
    assert out[1]["text"] == "pay [CARD] now" and out[1]["n_redactions"] == 1
    # email redacts first (pinned order), so the phone-shaped local part is gone
    assert out[2]["text"] == "mail [EMAIL] ok" and out[2]["n_redactions"] == 1


def test_pii_ops_are_pure_projections(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    for out in (pii_report(df, "id", "text"), redact_pii(df, "id", "text")):
        plan = spark._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
        assert "EvalPython" not in plan and "MapInPandas" not in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0


def test_patterns_shared_single_source():
    # the oracle SQL is generated from PII_PATTERNS — the dict is the single
    # source of truth; guard its shape so generation cannot silently drift
    assert list(PII_PATTERNS) == ["email", "ipv4", "ssn", "card", "phone"]
    assert all(repl.startswith("[") and repl.endswith("]") for _, repl in PII_PATTERNS.values())


def test_redaction_is_idempotent(spark):
    """Placeholders contain no redactable shapes: redact∘redact == redact."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    once = redact_pii(df, "id", "text")
    twice = redact_pii(once.select("id", "text"), "id", "text")
    a = {r["id"]: r["text"] for r in once.collect()}
    b = {r["id"]: (r["text"], r["n_redactions"]) for r in twice.collect()}
    assert all(b[i] == (t, 0) for i, t in a.items())


def test_publish_scrub_mode_publishes_redacted_rows(spark, tmp_path):
    """scrub_pii=True: a row whose only problem was PII publishes with
    placeholders + an audit count (the reference scrubs, it doesn't drop);
    other reject reasons still quarantine."""
    from batch_doc_vqa_spark.plans import publish_run, read_published, read_quarantine

    df = spark.createDataFrame(
        [(1, "mail me at alice@example.org now"), (2, ""), (3, "clean row")],
        "id long, text string",
    )
    out = str(tmp_path / "scrub")
    counts = publish_run(spark, df, out, text_col="text", run_id="s1", scrub_pii=True)
    assert (counts["published"], counts["quarantined"]) == (2, 1)
    pub = {r["id"]: r for r in read_published(spark, out).collect()}
    assert pub[1]["text"] == "mail me at [EMAIL] now" and pub[1]["n_redactions"] == 1
    assert pub[3]["n_redactions"] == 0
    assert {r["id"] for r in read_quarantine(spark, out).collect()} == {2}
    # default mode still quarantines the PII row
    out2 = str(tmp_path / "noscrub")
    c2 = publish_run(spark, df, out2, text_col="text", run_id="s2")
    assert (c2["published"], c2["quarantined"]) == (1, 2)
