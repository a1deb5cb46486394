"""URL canonicalization + per-host line-level boilerplate removal."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators import webclean


def test_canonicalize_urls_rules(spark):
    cases = [
        # (raw, expected canonical)
        ("HTTPS://Example.ORG:443/a//b/?utm_source=x&q=1#frag",
         "https://example.org/a/b?q=1"),
        ("http://Example.org:80/path/", "http://example.org/path"),
        ("http://example.org:8080/path", "http://example.org:8080/path"),  # non-default port kept
        ("https://example.org/", "https://example.org/"),                  # root slash kept
        ("https://example.org/a?fbclid=123&gclid=9", "https://example.org/a"),
        ("https://example.org/a?keep=1&utm_medium=m&keep2=2",
         "https://example.org/a?keep=1&keep2=2"),                          # order preserved
        ("https://example.org/A/B", "https://example.org/A/B"),            # path case kept
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(cases)], "i long, url string")
    got = {r["i"]: r["canonical_url"]
           for r in webclean.canonicalize_urls(df, "url").collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_url_dedup_groups_variants(spark):
    df = spark.createDataFrame(
        [("https://a.org/x?utm_source=1",), ("https://A.ORG/x#f",), ("https://a.org/y",)],
        "url string",
    )
    got = {r["canonical_url"]: r for r in webclean.url_dedup(df, "url").collect()}
    assert got["https://a.org/x"]["n_dups"] == 2
    assert got["https://a.org/y"]["n_dups"] == 1


def test_strip_boilerplate_lines(spark):
    pages = [
        ("h1", "COOKIE BANNER\nreal content one\nfooter"),
        ("h1", "COOKIE BANNER\nreal content two\nfooter"),
        ("h1", "COOKIE BANNER\nreal content three\nfooter"),
        ("h2", "COOKIE BANNER\nother host unique"),  # below min_pages on h2
    ]
    df = spark.createDataFrame(pages, "host string, text string")
    deny = {(r["host"], r["line"])
            for r in webclean.boilerplate_lines(df, "host", "text", min_pages=3).collect()}
    assert deny == {("h1", "COOKIE BANNER"), ("h1", "footer")}
    out = webclean.strip_boilerplate_lines(df, "host", "text", min_pages=3)
    texts = sorted(r["text"] for r in out.collect())
    assert texts == [
        "COOKIE BANNER\nother host unique",  # h2 untouched (no denylist row)
        "real content one",
        "real content three",
        "real content two",
    ]
    # row count preserved — cleaning never drops pages
    assert out.count() == 4
