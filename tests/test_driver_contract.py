"""Driver-contract invariants: entry() shape, query/oracle key consistency.

The driver's correctness gate compares queries() vs oracle_sql() — a key
present in one map but not the other silently downgrades a query to a weaker
check. As of round 2 every query has a full oracle; keep it that way."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_queries_and_oracles_cover_each_other():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {sorted(os_ - qs)}"
    assert qs <= os_, f"queries missing oracles: {sorted(qs - os_)}"
    assert len(qs) >= 62


def test_entry_returns_flagship_frame(spark):
    df = entrymod.entry(spark)
    assert [f.name for f in df.schema.fields] == ["url", "lang", "status", "n_chars", "n_spans"]
    rows = df.collect()
    assert len(rows) == 500
    assert {r["status"] for r in rows} <= {"ok", "ok_recall", "pdf", "empty", "error"}
    assert all(r["n_chars"] >= 0 for r in rows)
