"""Golden HTML fixtures: encoding edge cases, nesting, real-world shapes.

Byte-identity assertions (the north-rule invariant) on handcrafted documents
— the analogue of the reference's golden q11 dataset."""

from __future__ import annotations

from batch_doc_vqa_spark.functions import extract_html, extract_payload

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_utf8_multibyte_content():
    para = "Müller straße — héllo wörld ünïcode tæst and some ascii words too"
    r = extract_payload(f"<body><p>{para}</p></body>".encode("utf-8"))
    assert r.text == para
    assert r.text.encode("utf-8") == para.encode("utf-8")


def test_invalid_utf8_bytes_replaced_deterministically():
    payload = b"<body><p>" + b"valid words here today friend okay fine \xff\xfe broken" + b"</p></body>"
    r1, r2 = extract_payload(payload), extract_payload(payload)
    assert r1.text == r2.text and "�" in r1.text
    assert r1.status in ("ok", "ok_recall")


def test_nested_tables_in_content():
    html = (
        f"<body><div><p>{LONG} first paragraph words</p>"
        f"<table><tr><td>k1</td><td>v1</td></tr><tr><td>{LONG} cell with many words inside it</td></tr></table>"
        f"<p>{LONG} second paragraph words</p></div></body>"
    )
    r = extract_html(html)
    assert f"{LONG} first paragraph words" in r.text
    assert f"{LONG} second paragraph words" in r.text
    assert f"{LONG} cell with many words inside it" in r.text  # long cells kept
    assert "k1" not in r.text  # short cells dropped


def test_nav_inside_content_div_still_dropped():
    html = (
        f"<body><div class=c><p>{LONG}</p>"
        f'<nav><a href="/a">one two three four five six seven eight nine</a></nav>'
        f"<p>{LONG} tail</p></div></body>"
    )
    r = extract_html(html)
    assert "one two three" not in r.text
    assert r.text == f"{LONG}\n\n{LONG} tail"


def test_header_contributes_only_headings():
    html = (
        "<body><header><h1>Big Headline Words</h1>"
        f"<p>{LONG} header blurb that is long enough to pass</p></header>"
        f"<p>{LONG}</p></body>"
    )
    r = extract_html(html)
    assert r.text == f"Big Headline Words\n\n{LONG}"


def test_self_closing_and_void_tags():
    html = f"<body><p>{LONG} before<br/>{LONG} after</p><hr><p>{LONG} next</p></body>"
    r = extract_html(html)
    assert f"{LONG} before" in r.text and f"{LONG} after" in r.text and f"{LONG} next" in r.text


def test_attributes_with_angle_lookalikes():
    html = f'<body><p data-x="a>b" title=\'q\'>{LONG}</p></body>'
    r = extract_html(html)
    # attribute contains '>' — tag regex ends the tag there; remaining junk
    # must not leak classifier-breaking amounts of noise
    assert LONG in r.text


def test_deeply_nested_divs():
    html = "<body>" + "<div>" * 50 + f"<p>{LONG}</p>" + "</div>" * 50 + "</body>"
    assert extract_html(html).text == LONG


def test_case_insensitive_tags():
    html = f"<BODY><NAV><A HREF='/x'>skip this link text now ok</A></NAV><P>{LONG}</P></BODY>"
    assert extract_html(html).text == LONG
