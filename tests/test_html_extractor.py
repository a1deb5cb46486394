"""Kernel unit tests: byte-identity, determinism, cascade, robustness.

Mirrors the reference's test style — tiny handcrafted inputs with exact
expected values (/root/reference/tests/test_relaxed_name_matching.py style)
plus seeded-suite determinism
(/root/reference/tests/test_synthetic_benchmark_suite.py:49-66).
"""

from __future__ import annotations

from batch_doc_vqa_spark.functions import extract_html, extract_payload
from batch_doc_vqa_spark.sources.pages import page_row

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 words


def test_drops_nav_aside_footer_keeps_content():
    html = (
        "<html><body>"
        '<nav><ul><li><a href="/a">Home page link</a></li><li><a href="/b">Other link here</a></li></ul></nav>'
        f"<header><h1>Great Title</h1></header><div><p>{LONG}</p><p>{LONG} extra words here now</p></div>"
        f'<aside><a href="/x">promo one two</a> <a href="/y">promo three four</a></aside>'
        f"<footer><p>Copyright 2025 some media group all rights reserved</p></footer>"
        "</body></html>"
    )
    r = extract_html(html)
    assert r.status == "ok"
    assert r.text == f"Great Title\n\n{LONG}\n\n{LONG} extra words here now"
    assert [s[2] for s in r.spans] == ["heading", "para", "para"]
    # spans index exactly into text
    for start, end, _ in r.spans:
        assert r.text[start:end] == r.text[start:end].strip()


def test_script_style_comments_stripped():
    html = f"<body><script>var x = 'not {LONG} content';</script><style>p{{}}</style><!-- {LONG} --><p>{LONG}</p></body>"
    r = extract_html(html)
    assert r.text == LONG


def test_link_density_filter():
    farm = " ".join(f'<a href="/{i}">link text {i} here</a>' for i in range(10))
    html = f"<body><div>{farm}</div><p>{LONG}</p></body>"
    assert extract_html(html).text == LONG


def test_entities_and_whitespace_normalized():
    html = f"<body><p>  {LONG} &amp; more&nbsp;words\n\t here today friend  </p></body>"
    r = extract_html(html)
    # &nbsp; → \xa0 which is Unicode whitespace → collapsed like any other run
    assert r.text == f"{LONG} & more words here today friend"


def test_recall_cascade_short_doc():
    # every paragraph under the strict 8-word floor → precision yields nothing
    html = "<body><p>tiny fragment one two</p><p>second small block here</p><p>third wee block text</p></body>"
    r = extract_html(html)
    assert r.status == "ok_recall"
    assert r.text == "tiny fragment one two\n\nsecond small block here\n\nthird wee block text"


def test_malformed_html_no_crash():
    html = f"<body><div><span>{LONG}<p>{LONG} trailing words</div><p><b>{LONG}</body>"
    r = extract_html(html)
    assert r.status in ("ok", "ok_recall")
    assert LONG in r.text


def test_empty_and_garbage_inputs():
    assert extract_payload(b"").status == "empty"
    assert extract_payload(b"\x00\xff\xfe binary junk").status in ("empty", "ok_recall", "ok")
    assert extract_payload(None).status == "empty"


def test_clean_profile_byte_identity_to_intent():
    n_checked = 0
    for i in range(400):
        row = page_row(42, i)
        if row["profile"] not in ("clean", "pdf"):
            continue
        r = extract_payload(row["html"])
        assert r.text == row["intent_text"], row["url"]
        assert r.text.encode("utf-8") == row["intent_text"].encode("utf-8")
        n_checked += 1
    assert n_checked > 100


def test_generator_determinism():
    a, b = page_row(4101, 17), page_row(4101, 17)
    assert a["html"] == b["html"] and a["url"] == b["url"] and a["warc_ts"] == b["warc_ts"]
    assert page_row(4201, 17)["html"] != a["html"]


def test_kernel_determinism_on_noisy():
    for i in range(100):
        row = page_row(4301, i)
        r1, r2 = extract_payload(row["html"]), extract_payload(row["html"])
        assert r1.text == r2.text and r1.spans == r2.spans and r1.status == r2.status


def test_gzip_payloads_transparently_decompress():
    """Crawl payloads are often gzip members: magic 1f 8b → decompress, then
    dispatch as usual (HTML, SPDF or PDF inside); corrupt gzip fails loud."""
    import gzip

    from batch_doc_vqa_spark.functions.html_extract import extract_payload

    html = b"<html><body><p>" + b"many plain words here " * 10 + b"</p></body></html>"
    plain = extract_payload(html)
    zipped = extract_payload(gzip.compress(html))
    assert zipped.status == plain.status and zipped.text == plain.text
    bad = extract_payload(b"\x1f\x8b" + b"\x00" * 20)
    assert bad.status == "unsupported_format" and "gzip" in bad.error
    # gzipped real PDF also routes correctly after decompression
    from batch_doc_vqa_spark.functions.pdf_real import encode_minimal_pdf

    inner = extract_payload(gzip.compress(encode_minimal_pdf([["gz pdf line"]])))
    assert inner.status == "pdf_text" and inner.text == "gz pdf line"


def test_bom_and_utf16_payloads_decode():
    from batch_doc_vqa_spark.functions.html_extract import extract_payload

    html = "<html><body><p>" + "unicode wörds here " * 10 + "</p></body></html>"
    base = extract_payload(html.encode("utf-8"))
    bom8 = extract_payload(b"\xef\xbb\xbf" + html.encode("utf-8"))
    u16 = extract_payload(html.encode("utf-16"))       # LE with BOM
    u16be = extract_payload("﻿".encode("utf-16-be") + html.encode("utf-16-be"))
    assert base.status in ("ok", "ok_recall")
    assert bom8.text == base.text
    assert u16.text == base.text
    assert u16be.text == base.text


def test_unclosed_header_does_not_swallow_document():
    """An unclosed <header> is a common crawl pathology: when the 'masthead'
    ends up holding most of the document's chars across several non-heading
    blocks, the runaway-header repair demotes it to body content."""
    paras = [
        "brave new words appear here in this long enough paragraph today",
        "second block of body prose with plenty of words to keep things going",
        "third block closing out the page with more than enough real words",
    ]
    html = "<html><body><header><h1>Headline Words Here</h1>" + "".join(
        f"<p>{p}</p>" for p in paras
    )
    r = extract_html(html)
    for p in paras:
        assert p in r.text
    assert "Headline Words Here" in r.text  # headline still kept
    # a SMALL well-formed header keeps the headings-only masthead contract
    html2 = (
        "<body><header><h1>Real Masthead Headline</h1><p>small tagline here "
        "with just enough words to pass strict</p></header>"
        f"<p>{paras[0]}</p><p>{paras[1]}</p></body>"
    )
    r2 = extract_html(html2)
    assert "small tagline" not in r2.text and "Real Masthead Headline" in r2.text


def test_hard_profiles_recall_and_precision():
    """Hard-mode corpus tiers (VERDICT r3 #5): every content paragraph is
    recovered (recall) and trackers/footer boilerplate never leak
    (precision), per profile."""
    import collections

    seen = collections.Counter()
    for i in range(512):
        row = page_row(42, i)
        prof = row["profile"]
        if prof not in ("malformed_nest", "table_heavy", "near_empty"):
            continue
        seen[prof] += 1
        r = extract_payload(row["html"])
        assert r.status == "ok", (i, prof, r.status)
        blocks = row["intent_text"].split("\n\n")
        title, paras = blocks[0], blocks[1:]
        if prof != "near_empty":
            # near_empty's title is a bare 3-5 word line with no markup —
            # indistinguishable from junk, so dropping it is correct
            # precision behavior; the paragraphs are the content
            assert title in r.text, (i, prof)
        for j, p in enumerate(paras):
            if prof == "malformed_nest":
                # the crossed inline tags inject three words mid-paragraph
                words = p.split(" ")
                mid = len(words) // 2
                p = " ".join(words[:mid]) + " bold both italic " + " ".join(words[mid:])
            elif prof == "near_empty" and j == 0:
                p = p.replace(" ", " & ", 1)  # entity round-trip
            assert p in r.text, (i, prof, j)
        for junk in ("all rights reserved", "track('", 'href="/ad"'):
            assert junk not in r.text, (i, prof, junk)
    # all three tiers actually appeared in the sample
    assert set(seen) == {"malformed_nest", "table_heavy", "near_empty"}
    assert all(v >= 10 for v in seen.values()), seen


def test_hard_override_leaves_other_rows_byte_identical():
    """The hard tier draws from an independent rng stream: rows it does not
    claim must be byte-identical to what the base profiles generate."""
    from batch_doc_vqa_spark.sources import pages as P

    base_rows = {}
    for i in range(60):
        r = P.page_row(42, i)
        base_rows[i] = (r["profile"], r["html"])
    # regenerate with the hard tier disabled
    orig = P.HARD_FRACTION
    P.HARD_FRACTION = -1.0
    try:
        for i in range(60):
            r = P.page_row(42, i)
            prof, html = base_rows[i]
            if prof in P.HARD_PROFILES:
                assert r["html"] != html  # hard rows differ by construction
            else:
                assert r["html"] == html and r["profile"] == prof
    finally:
        P.HARD_FRACTION = orig
