"""Golden-artifact staleness check (VERDICT r4 #8): COVERAGE.md's committed
totals must match what the source actually provides. Mirrors the reference's
``update_benchmarks.py --check`` pattern
(/root/reference/scripts/update_benchmarks.py:104-221): regenerate the
numbers, fail loudly on drift — cheap insurance for a ~100-query surface.

The doc carries one machine-readable line:
``<!-- totals: queries=N oracles=N tests=N -->``
No Spark session needed; this test only imports the registry and greps."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _source_totals():
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    stray = sorted(set(oracles) - set(queries))
    assert not stray, f"oracle_sql() keys with no queries() entry: {stray}"
    n_tests = 0
    tests_dir = os.path.join(REPO, "tests")
    for fn in sorted(os.listdir(tests_dir)):
        if fn.startswith("test_") and fn.endswith(".py"):
            with open(os.path.join(tests_dir, fn)) as f:
                n_tests += len(re.findall(r"^def test_", f.read(), re.M))
    return {"queries": len(queries), "oracles": len(set(queries) & set(oracles)),
            "tests": n_tests}


def test_coverage_doc_totals_match_source():
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        doc = f.read()
    m = re.search(r"<!-- totals: queries=(\d+) oracles=(\d+) tests=(\d+) -->", doc)
    assert m, "COVERAGE.md is missing its machine-readable totals line"
    committed = {"queries": int(m.group(1)), "oracles": int(m.group(2)),
                 "tests": int(m.group(3))}
    actual = _source_totals()
    assert committed == actual, (
        f"COVERAGE.md totals drifted: committed={committed} actual={actual} — "
        "update the '<!-- totals: ... -->' line (and the surrounding prose)"
    )


def test_bench_suite_covers_only_registered_queries():
    """Every BENCH_QUERIES entry must be a real queries() key — a renamed
    query must not leave a stale bench entry that KeyErrors at record time."""
    import __spark_entry__ as entry
    from bench import BENCH_QUERIES

    missing = [q for q in BENCH_QUERIES if q not in entry.queries()]
    assert not missing, f"bench.py names unregistered queries: {missing}"


def test_readme_counts_match_source():
    """README's headline counts must not drift from the source either
    (review r5: README said 228 while the machine-checked line said 230)."""
    with open(os.path.join(REPO, "README.md")) as f:
        doc = f.read()
    actual = _source_totals()
    m = re.search(r"(\d+) pytest\s+tests", doc)
    assert m and int(m.group(1)) == actual["tests"], (m and m.group(1), actual["tests"])
    m = re.search(r"Correctness: (\d+) driver-contract queries, \*\*(\d+) with", doc)
    assert m and (int(m.group(1)), int(m.group(2))) == (actual["queries"], actual["oracles"])
